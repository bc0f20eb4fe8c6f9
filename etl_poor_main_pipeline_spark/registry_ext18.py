"""Operator registry, wave 19: the retrieval / curation ops a pretraining
corpus pipeline runs between dedup and training — inverted-index build,
BM25 ranking, distribution-shaping (temperature mixing, winsorization,
z-score outlier flags), and an embedding-covariance pass (the input to
PCA whitening).

Scale stance (the 100 TB question, per op):
- inverted index: one shuffle on term; postings bounded to a head-K per
  term via row_number *before* the collect_list, so no unbounded
  per-group state ever materializes (a naive collect_list of a common
  term's postings is an OOM at corpus scale).
- BM25: df/avgdl are corpus-level scalars (tiny aggregate, broadcast
  back); scoring is one shuffle on term then one on doc — both
  vocabulary/doc bounded, no Python.
- temperature mixing: per-source hash-rank (md5, reproducible across
  engines/runs — no RNG state) with targets ∝ n^α; one window shuffle
  on source, skew-safe because rank cutoffs don't need a global sort.
- winsorize/z-score: per-key percentile/moment aggregates; moments run
  on decimal(18,6)-quantized values so the distributed sum order can't
  perturb the result (same stance as registry._dsum).
- covariance: one aggregate pass emitting the d_head x d_head moment
  block as wide columns — zero extra shuffles, products of float32 are
  exact in double, sums go through decimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.dedup import spread
from .registry import QuerySpec, _t


# --------------------------------------------------------------------------
# inverted index (X6 [EXT])
# --------------------------------------------------------------------------


def _doc_terms(d: DataFrame) -> DataFrame:
    """(doc_id, term) pairs, one row per DISTINCT term per doc."""
    toks = F.array_distinct(
        F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    )
    return spread(d).select("doc_id", F.explode(toks).alias("term"))


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6 inverted-index build: term -> document frequency + the
    head of the (sorted) posting list. The head-K cut happens via
    row_number BEFORE the list aggregation, so per-term state is bounded
    at K even for stop-word-frequency terms — the collect-then-slice
    formulation dies on the most common term first at corpus scale."""
    pairs = _doc_terms(_t(spark, sf_dir, "documents"))
    w = Window.partitionBy("term").orderBy("doc_id")
    ranked = pairs.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.array_join(
                F.array_sort(
                    F.collect_list(F.when(F.col("rn") <= 10, F.col("doc_id")))
                ),
                ",",
            ).alias("postings_head"),
        )
        .filter(F.col("df") >= 100)
        .orderBy("term")
    )


_ORACLE_INVERTED = """
WITH pairs AS (
  SELECT doc_id,
         unnest(list_distinct(
           list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))) AS term
  FROM documents
), ranked AS (
  SELECT term, doc_id,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
  FROM pairs
)
SELECT term, cast(count(*) AS bigint) AS df,
       coalesce(array_to_string(
         list_sort(list(doc_id) FILTER (WHERE rn <= 10)), ','), '')
         AS postings_head
FROM ranked
GROUP BY term HAVING count(*) >= 100
ORDER BY term
"""


# --------------------------------------------------------------------------
# BM25 ranking (X6 [EXT])
# --------------------------------------------------------------------------

_BM25_QUERY_TERMS = ("spark", "join", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6 BM25 ranking of documents for a fixed term query
    (Robertson/Sparck Jones weighting, the lexical-retrieval baseline).
    Corpus stats (N, avgdl) are one tiny aggregate; df comes from one
    term-level aggregate over distinct (doc, term) pairs; scoring joins the
    per-(doc, term) tf rows with doc lengths on the shared doc key (shuffled
    — dl is corpus-sized) plus broadcasts of the genuinely tiny df/stats
    frames. Output: top 15 docs by micro-rounded score with doc_id
    tiebreak."""
    d = _t(spark, sf_dir, "documents")
    toks = spread(d).select(
        "doc_id",
        F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "").alias("toks"),
    )
    dl = toks.select("doc_id", F.size("toks").alias("dl"))
    # corpus scalars as a 1-row broadcastable frame (no driver collect)
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .where(F.col("term").isin(*_BM25_QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    # df_ (one row per query term) and stats (1 row) are genuinely tiny —
    # broadcast them. dl is per-document (corpus-sized at 100 TB): join it
    # shuffled; tf and dl are both doc-keyed so they co-partition.
    contrib = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                idf
                * (F.col("tf") * (_BM25_K1 + 1))
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).cast("decimal(38,16)").alias("c"),
        )
    )
    # decimal sum: shuffle reduce order cannot perturb the last ulp and flip
    # score_micro / the top-15 tie order (same _dsum stance as pagerank_docs)
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.floor(F.sum("c").cast("double") * 1e6 + F.lit(0.5))
            .cast("bigint")
            .alias("score_micro")
        )
        .orderBy(F.desc("score_micro"), "doc_id")
        .limit(15)
    )


_ORACLE_BM25 = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS t
  FROM documents
), dl AS (
  SELECT doc_id, len(t) AS dl FROM toks
), stats AS (
  SELECT cast(count(*) AS double) AS n_docs,
         sum(dl) * 1.0 / count(*) AS avgdl
  FROM dl
), tf AS (
  SELECT doc_id, term, cast(count(*) AS double) AS tf
  FROM (SELECT doc_id, unnest(t) AS term FROM toks)
  WHERE term IN {_BM25_QUERY_TERMS!r}
  GROUP BY doc_id, term
), df AS (
  SELECT term, cast(count(*) AS double) AS df FROM tf GROUP BY term
)
SELECT tf.doc_id,
       cast(floor(cast(sum(cast(
         ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
         * (tf.tf * ({_BM25_K1} + 1))
         / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl))
       AS decimal(38,16))) AS double) * 1e6 + 0.5) AS bigint) AS score_micro
FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
GROUP BY tf.doc_id
ORDER BY score_micro DESC, tf.doc_id
LIMIT 15
"""


# --------------------------------------------------------------------------
# distribution shaping (X7/X8 [EXT])
# --------------------------------------------------------------------------


def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 z-score outlier flags: per-event-type population moments
    computed on decimal-quantized values (distributed sum order can't
    perturb a decimal sum — registry._dsum stance), outliers |z| > 2.5
    reported with a 1e4-rounded score. One aggregate + one broadcast
    join back; no global sort until the (tiny) outlier set."""
    e = _t(spark, sf_dir, "events")
    v6 = F.col("value").cast("decimal(18,6)")
    stats = e.groupBy("event_type").agg(
        (F.sum(v6) / F.count(F.lit(1))).cast("double").alias("mean"),
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum((v6 * v6).cast("decimal(38,12)")).cast("double").alias("ss"),
    )
    stats = stats.select(
        "event_type",
        "mean",
        F.sqrt(F.col("ss") / F.col("n") - F.col("mean") * F.col("mean")).alias("sd"),
    )
    z = (F.col("value") - F.col("mean")) / F.col("sd")
    return (
        e.join(F.broadcast(stats), "event_type")
        .where(F.abs(z) > 2.5)
        .select(
            "event_id",
            "event_type",
            (F.floor(z * 1e4 + F.lit(0.5)) / 1e4).alias("zscore"),
        )
        .orderBy("event_id")
    )


_ORACLE_ZSCORE = """
WITH stats AS (
  SELECT event_type,
         cast(sum(cast(value AS decimal(18,6))) / count(*) AS double) AS mean,
         cast(count(*) AS double) AS n,
         cast(sum(cast(cast(value AS decimal(18,6)) * cast(value AS decimal(18,6))
                       AS decimal(38,12))) AS double) AS ss
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       floor((e.value - s.mean) / sqrt(s.ss / s.n - s.mean * s.mean) * 1e4 + 0.5)
         / 1e4 AS zscore
FROM events e JOIN stats s USING (event_type)
WHERE abs((e.value - s.mean) / sqrt(s.ss / s.n - s.mean * s.mean)) > 2.5
ORDER BY e.event_id
"""


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 winsorization: clip each event's value at its type's
    exact [p05, p95] (Spark `percentile` == DuckDB `quantile_cont`,
    linear interpolation), then report the clipped mean per type through
    the decimal path. The percentile aggregate is one shuffle on a
    low-cardinality key; the clip is a broadcast join back."""
    e = _t(spark, sf_dir, "events")
    pct = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    clipped = e.join(F.broadcast(pct), "event_type").select(
        "event_type",
        "p05",
        "p95",
        F.greatest(F.col("p05"), F.least(F.col("p95"), F.col("value"))).alias("v"),
    )
    return (
        clipped.groupBy("event_type")
        .agg(
            (F.floor(F.first("p05") * 1e4 + F.lit(0.5)) / 1e4).alias("p05"),
            (F.floor(F.first("p95") * 1e4 + F.lit(0.5)) / 1e4).alias("p95"),
            (
                F.floor(
                    (F.sum(F.col("v").cast("decimal(18,6)")) / F.count(F.lit(1)))
                    .cast("double") * 1e4
                    + F.lit(0.5)
                )
                / 1e4
            ).alias("clipped_mean"),
        )
        .orderBy("event_type")
    )


_ORACLE_WINSORIZE = """
WITH pct AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS p05,
         quantile_cont(value, 0.95) AS p95
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       floor(any_value(p.p05) * 1e4 + 0.5) / 1e4 AS p05,
       floor(any_value(p.p95) * 1e4 + 0.5) / 1e4 AS p95,
       floor(cast(sum(cast(greatest(p.p05, least(p.p95, e.value))
                           AS decimal(18,6))) / count(*) AS double) * 1e4 + 0.5)
         / 1e4 AS clipped_mean
FROM events e JOIN pct p USING (event_type)
GROUP BY e.event_type
ORDER BY e.event_type
"""


def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X8 temperature-flattened source mixing (the multilingual-
    pretraining resampling rule: target_s ∝ n_s^α with α=0.5 flattens
    the source distribution toward uniform). Targets are exact integers
    (floor(10·√n + 0.5)), membership is the per-source md5 hash-rank —
    reproducible across engines, runs, and cluster sizes, unlike RNG
    sampling. One window shuffle on source; no global sort."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")))
    ranked = d.withColumn("rk", F.row_number().over(w))
    per_src = ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total")
    )
    target = F.floor(F.sqrt(F.col("n_total").cast("double")) * 10 + F.lit(0.5)).cast(
        "bigint"
    )
    kept = (
        ranked.join(F.broadcast(per_src.select("source", target.alias("n_target"))), "source")
        .where(F.col("rk") <= F.col("n_target"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_kept"))
    )
    return (
        per_src.join(kept, "source")
        .select(
            "source",
            "n_total",
            F.least(
                F.floor(F.sqrt(F.col("n_total").cast("double")) * 10 + F.lit(0.5)).cast("bigint"),
                F.col("n_total"),
            ).alias("n_target"),
            "n_kept",
        )
        .orderBy("source")
    )


_ORACLE_MIXTURE = """
WITH ranked AS (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source ORDER BY md5(cast(doc_id AS varchar))) AS rk
  FROM documents
), per_src AS (
  SELECT source, cast(count(*) AS bigint) AS n_total FROM documents GROUP BY source
), tgt AS (
  SELECT source, n_total,
         cast(floor(sqrt(cast(n_total AS double)) * 10 + 0.5) AS bigint) AS n_target
  FROM per_src
)
SELECT t.source, t.n_total,
       least(t.n_target, t.n_total) AS n_target,
       cast(count(*) AS bigint) AS n_kept
FROM ranked r JOIN tgt t USING (source)
WHERE r.rk <= t.n_target
GROUP BY t.source, t.n_total, t.n_target
ORDER BY t.source
"""


# --------------------------------------------------------------------------
# embedding covariance (X3 [EXT])
# --------------------------------------------------------------------------

_COV_D = 6  # head block of the 64-dim embedding: d*(d+1)/2 = 21 upper-tri cells


def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X3 covariance block over the embedding column — the moment
    pass PCA/whitening starts from. One aggregate emits all first and
    second moments for the head-D dims (float32 products are exact in
    double; sums run through decimal so distributed order is moot), then
    cov(i,j) = E[xy] - E[x]E[y] folds on the single result row. Zero
    shuffles beyond the one aggregate; at 100 TB this is the map-side-
    combine pattern (64x64 moments is ~4 KB of state per task)."""
    e = _t(spark, sf_dir, "embeddings")
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for i in range(_COV_D):
        xi = F.element_at("embedding", i + 1).cast("double")
        aggs.append(F.sum(xi.cast("decimal(28,10)")).cast("double").alias(f"s_{i}"))
        for j in range(i, _COV_D):
            xj = F.element_at("embedding", j + 1).cast("double")
            aggs.append(
                F.sum((xi * xj).cast("decimal(28,10)"))
                .cast("double")
                .alias(f"ss_{i}_{j}")
            )
    m = e.agg(*aggs)
    cols = []
    for i in range(_COV_D):
        for j in range(i, _COV_D):
            cov = (
                F.col(f"ss_{i}_{j}") / F.col("n")
                - (F.col(f"s_{i}") / F.col("n")) * (F.col(f"s_{j}") / F.col("n"))
            )
            cols.append(
                (F.floor(cov * 1e6 + F.lit(0.5)) / 1e6).alias(f"cov_{i}_{j}")
            )
    return m.select(*cols)


def _oracle_covariance() -> str:
    moment_exprs = ["cast(count(*) AS double) AS n"]
    for i in range(_COV_D):
        moment_exprs.append(
            f"cast(sum(cast(cast(embedding[{i + 1}] AS double) AS decimal(28,10))) "
            f"AS double) AS s_{i}"
        )
        for j in range(i, _COV_D):
            moment_exprs.append(
                f"cast(sum(cast(cast(embedding[{i + 1}] AS double) * "
                f"cast(embedding[{j + 1}] AS double) AS decimal(28,10))) "
                f"AS double) AS ss_{i}_{j}"
            )
    cov_exprs = [
        f"floor((ss_{i}_{j} / n - (s_{i} / n) * (s_{j} / n)) * 1e6 + 0.5) / 1e6 "
        f"AS cov_{i}_{j}"
        for i in range(_COV_D)
        for j in range(i, _COV_D)
    ]
    return (
        "WITH m AS (SELECT "
        + ", ".join(moment_exprs)
        + " FROM embeddings) SELECT "
        + ", ".join(cov_exprs)
        + " FROM m"
    )


REGISTRY_EXT18: dict[str, QuerySpec] = {
    "inverted_index_postings": QuerySpec(
        q_inverted_index, _ORACLE_INVERTED, "X6 [EXT] inverted index"
    ),
    "bm25_topk": QuerySpec(q_bm25_topk, _ORACLE_BM25, "X6 [EXT] BM25 ranking"),
    "anomaly_zscore": QuerySpec(q_anomaly_zscore, _ORACLE_ZSCORE, "X7 [EXT]"),
    "winsorize_clip": QuerySpec(q_winsorize, _ORACLE_WINSORIZE, "X7 [EXT]"),
    "mixture_temperature_sample": QuerySpec(
        q_mixture_temperature, _ORACLE_MIXTURE, "X8 [EXT] temperature mixing"
    ),
    "embedding_covariance": QuerySpec(
        q_embedding_covariance, _oracle_covariance(), "X3 [EXT] moment pass"
    ),
}
