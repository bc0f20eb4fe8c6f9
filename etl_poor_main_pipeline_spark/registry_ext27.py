"""Operator registry, wave 28: sequence + drift + tokenizer-training
ops — the Markov transition matrix over per-user event sequences, a
chi-square term-drift monitor between corpus halves, and BPE merge-
candidate mining (the inner loop of tokenizer training).

Scale stances:
- transitions: one lead() window per user (bounded partitions), then a
  |states|²-bounded count matrix; probabilities derive from broadcast
  row totals.
- drift: two corpus-half term frequencies in ONE pass (conditional
  aggregation on the split flag — no second scan), chi-square computed
  per term from the 2x2 table; integer micro outputs.
- BPE: adjacent-pair extraction is a per-token transform (no shuffle
  until the pair count), and the pair vocabulary is bounded by the
  symbol alphabet — the distributed formulation of the merge-candidate
  scan every BPE trainer runs per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.dedup import spread
from .registry import QuerySpec, _t

# --------------------------------------------------------------------------
# Markov transition matrix (X9 [EXT] sequences)
# --------------------------------------------------------------------------


def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X9 first-order Markov transitions over per-user event
    sequences: P(next event type | current), from lead() over (ts,
    event_id)-ordered per-user streams. Output is the full transition
    matrix with counts and row-normalized micro-probabilities — the
    behavioral model behind next-action prediction and anomaly
    scoring. The matrix is |event_type|²-bounded regardless of corpus
    size."""
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        e.select("user_id", "event_id", "ts", F.col("event_type").alias("src"))
        .withColumn("dst", F.lead("src").over(w))
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    row_tot = tr.groupBy("src").agg(F.sum("n").alias("tot"))
    return (
        tr.join(F.broadcast(row_tot), "src")
        .select(
            "src",
            "dst",
            F.col("n").cast("bigint").alias("n_transitions"),
            F.floor(F.lit(1000000.0) * F.col("n") / F.col("tot") + F.lit(0.5))
            .cast("bigint")
            .alias("p_micro"),
        )
        .orderBy("src", "dst")
    )


_ORACLE_MARKOV = """
WITH seq AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
),
tr AS (
  SELECT src, dst, cast(count(*) AS double) AS n
  FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
),
tot AS (SELECT src, sum(n) AS tot FROM tr GROUP BY src)
SELECT tr.src, tr.dst,
       cast(tr.n AS bigint) AS n_transitions,
       cast(floor(1000000.0 * tr.n / tot.tot + 0.5) AS bigint) AS p_micro
FROM tr JOIN tot USING (src)
ORDER BY tr.src, tr.dst
"""


# --------------------------------------------------------------------------
# Chi-square term drift between corpus halves (X6/DQ [EXT])
# --------------------------------------------------------------------------

_DRIFT_TOP = 25


def q_term_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6/DQ term-drift monitor: split the corpus into halves by
    doc_id parity (standing in for yesterday-vs-today snapshots),
    compute each term's 2x2 chi-square keyness between halves, report
    the top {_DRIFT_TOP} by chi2 (term tiebreak). Both halves' counts
    come from ONE pass via conditional aggregation; the chi-square is
    evaluated on identical doubles and reported as a micro-int — the
    statistical drift alarm a corpus-refresh pipeline runs before
    retraining."""
    d = spread(_t(spark, sf_dir, "documents"))
    toks = d.select(
        (F.col("doc_id") % 2 == 0).alias("in_a"),
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
        ).alias("term"),
    )
    per_term = toks.groupBy("term").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("double").alias("a"),
        F.sum(F.when(~F.col("in_a"), 1).otherwise(0)).cast("double").alias("b"),
    )
    totals = per_term.agg(
        F.sum("a").alias("ta"), F.sum("b").alias("tb")
    ).withColumn("j", F.lit(1))
    # chi2 for the 2x2 table (a, ta-a; b, tb-b) with expected counts from
    # the pooled rate; guard zero expectations via the pooled term total
    chi2 = (
        "CASE WHEN (a + b) > 0 THEN"
        " (a - (a + b) * ta / (ta + tb)) * (a - (a + b) * ta / (ta + tb))"
        "   / ((a + b) * ta / (ta + tb))"
        " + (b - (a + b) * tb / (ta + tb)) * (b - (a + b) * tb / (ta + tb))"
        "   / ((a + b) * tb / (ta + tb))"
        " ELSE 0.0D END"
    )
    return (
        per_term.withColumn("j", F.lit(1))
        .join(F.broadcast(totals), "j")
        .selectExpr(
            "term",
            "cast(a as bigint) as n_half_a",
            "cast(b as bigint) as n_half_b",
            f"cast(floor(1000000.0D * ({chi2}) + 0.5D) as bigint) as chi2_micro",
        )
        .orderBy(F.desc("chi2_micro"), "term")
        .limit(_DRIFT_TOP)
    )


_ORACLE_DRIFT = rf"""
WITH toks AS (
  SELECT doc_id % 2 = 0 AS in_a,
         unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS term
  FROM documents
),
per_term AS (
  SELECT term,
         cast(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS double) AS a,
         cast(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS double) AS b
  FROM toks GROUP BY term
),
totals AS (SELECT sum(a) AS ta, sum(b) AS tb FROM per_term)
SELECT term,
       cast(a AS bigint) AS n_half_a,
       cast(b AS bigint) AS n_half_b,
       cast(floor(1000000.0 * (
         CASE WHEN (a + b) > 0 THEN
           (a - (a + b) * ta / (ta + tb)) * (a - (a + b) * ta / (ta + tb))
             / ((a + b) * ta / (ta + tb))
           + (b - (a + b) * tb / (ta + tb)) * (b - (a + b) * tb / (ta + tb))
             / ((a + b) * tb / (ta + tb))
         ELSE 0.0 END) + 0.5) AS bigint) AS chi2_micro
FROM per_term, totals
ORDER BY chi2_micro DESC, term
LIMIT {_DRIFT_TOP}
"""


# --------------------------------------------------------------------------
# BPE merge-candidate mining (X6 [EXT] tokenizer training)
# --------------------------------------------------------------------------

_BPE_TOP = 20


def q_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6 the inner loop of BPE tokenizer training, distributed:
    treat every word as a character sequence and count adjacent symbol
    pairs corpus-wide; the argmax pair is the next merge. Output: top
    {_BPE_TOP} candidate merges (pair tiebreak). Pair extraction is a
    pure per-word transform (no shuffle until the count), and the pair
    vocabulary is alphabet²-bounded — at 100 TB the count table, not
    the corpus, is the state. One BPE iteration == one such scan +
    merge-table update."""
    d = spread(_t(spark, sf_dir, "documents"))
    words = d.select(
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
        ).alias("word")
    )
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> concat(substr(word, i, 1), substr(word, i + 1, 1)))"
            )
        ).alias("pair")
    ).where(F.length("pair") == 2)
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(_BPE_TOP)
    )


_ORACLE_BPE = rf"""
WITH words AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS word
  FROM documents
),
pairs AS (
  SELECT substr(word, cast(i AS int), 2) AS pair
  FROM words, range(1, 1000) t(i)
  WHERE i <= len(word) - 1
)
SELECT pair, cast(count(*) AS bigint) AS n
FROM pairs WHERE len(pair) = 2
GROUP BY pair ORDER BY n DESC, pair
LIMIT {_BPE_TOP}
"""


REGISTRY_EXT27: dict[str, QuerySpec] = {
    "markov_transitions": QuerySpec(
        q_markov_transitions, _ORACLE_MARKOV, "X9 [EXT] sequence model"
    ),
    "term_drift_chi2": QuerySpec(
        q_term_drift_chi2, _ORACLE_DRIFT, "X6/DQ [EXT] drift monitor"
    ),
    "bpe_merge_candidates": QuerySpec(
        q_bpe_merge_candidates, _ORACLE_BPE, "X6 [EXT] BPE inner loop"
    ),
}
