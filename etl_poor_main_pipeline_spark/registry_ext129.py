"""Wave 129 [EXT]: training-data-pipeline planners and audits —
context-length truncation loss curve, truncation content drift (does
cutting at L tokens bias the token distribution?), T5-style span
corruption plan, and hard-negative mining over the embedding corpus.

Scale notes (the 100x question, per query):
- truncation_loss_curve: per-doc token counts reduce map-side; the
  5-point literal cut grid is a cross join against that count frame —
  one shuffle, no window.
- truncation_content_drift: full vs first-{tl}-token unigram counts
  reduce per (source, token) in one pass (slice() keeps the prefix
  in-row); the per-source total-variation distance numerator
  sum |c_p*Nq - c_q*Np| stays exact integer.
- span_corruption_plan: pure integer arithmetic per document (mask
  rate 15% and mean span 3 folded into exact div/round forms), then a
  per-source reduce — no floats until the final ratio.
- hard_negative_mining_topk: the {k}-anchor keyset (smallest vec_ids,
  LIMIT-bounded) joins the embedding corpus with a label-mismatch
  predicate; per-anchor top-1 is a partitioned window over the scored
  join (the knn_label_vote shape — bounded keyset, so the join output
  is <= k*N scored rows reduced per anchor, never all-pairs).

Reference parity: none; [EXT] X3/X6/X8 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import QuerySpec, _t

_DEC = "cast({x} as decimal(38,0))"
_TOK = r"filter(split(text, '\\s+'), t -> t <> '')"
_DUCK_TOK = r"list_filter(string_split_regex(text, '\s+'), x -> x <> '')"

_TRUNC_CUTS = (64, 128, 256, 512, 1024)
_DRIFT_L = 128  # truncation prefix for content-drift audit
_SPAN_RATE_PCT = 15  # T5 mask rate (percent, exact integer arithmetic)
_SPAN_MEAN = 3  # T5 mean span length
_HN_K = 8  # hard-negative anchors (smallest vec_ids)


# --------------------------------------------------------------------------
# Truncation loss curve (X8 [EXT])
# --------------------------------------------------------------------------


def q_truncation_loss_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X8 context-length planning: for each candidate max-length
    cut L, how many documents exceed L whitespace tokens and what
    fraction of corpus tokens a hard truncation at L discards —
    the curve a pretraining pipeline reads to pick its sequence length.
    Output per cut: cut, n_docs, docs_over, tokens_lost,
    lost_share_micro."""
    d = _t(spark, sf_dir, "documents")
    counts = d.select(F.expr(f"size({_TOK})").cast("bigint").alias("n"))
    cuts = ",".join(str(c) for c in _TRUNC_CUTS)
    grid = counts.select(
        "n", F.explode(F.expr(f"array({cuts})")).alias("cut")
    )
    agg = grid.groupBy("cut").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.expr("cast(n > cut as int)")).cast("bigint").alias("docs_over"),
        F.sum(F.expr("greatest(n - cut, 0L)")).cast("bigint").alias("tokens_lost"),
        F.sum("n").cast("bigint").alias("tot"),
    )
    return agg.selectExpr(
        "cast(cut as bigint) AS cut",
        "n_docs",
        "docs_over",
        "tokens_lost",
        "cast(floor(1e6 * cast(tokens_lost as double) / cast(tot as double)"
        " + 0.5) as bigint) AS lost_share_micro",
    ).orderBy("cut")


_ORACLE_TRUNC = f"""
WITH counts AS (
  SELECT len({_DUCK_TOK})::BIGINT AS n FROM documents
),
grid AS (
  SELECT n, cut
  FROM counts, unnest([{", ".join(str(c) for c in _TRUNC_CUTS)}]) AS u(cut)
),
agg AS (
  SELECT cut, count(*)::BIGINT AS n_docs,
         sum(CASE WHEN n > cut THEN 1 ELSE 0 END)::BIGINT AS docs_over,
         sum(greatest(n - cut, 0))::BIGINT AS tokens_lost,
         sum(n)::BIGINT AS tot
  FROM grid GROUP BY 1
)
SELECT cast(cut AS BIGINT) AS cut, n_docs, docs_over, tokens_lost,
       cast(floor(1e6 * cast(tokens_lost AS DOUBLE) / cast(tot AS DOUBLE)
            + 0.5) AS BIGINT) AS lost_share_micro
FROM agg ORDER BY cut
"""


# --------------------------------------------------------------------------
# Truncation content drift (X6 [EXT])
# --------------------------------------------------------------------------


def q_truncation_content_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """[EXT] X6 does truncating every document at {l} tokens BIAS the
    per-source token distribution? Total-variation distance between the
    full unigram distribution P and the first-{l}-token distribution Q,
    TV = sum_tok |c_p*Nq - c_q*Np| / (2*Np*Nq) — exact integer
    numerator per source. A large TV means tail-of-document content
    differs systematically from the head (truncation changes the
    corpus, not just its size). Output per source: source, n_full,
    n_trunc, tv_micro."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "source",
        F.posexplode(F.expr(_TOK)).alias("pos", "tok"),
    )
    freq = tok.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("cp"),
        F.sum(F.expr(f"cast(pos < {_DRIFT_L} as int)"))
        .cast("bigint")
        .alias("cq"),
    )
    tots = freq.groupBy("source").agg(
        F.sum("cp").cast("bigint").alias("np"),
        F.sum("cq").cast("bigint").alias("nq"),
    )
    red = (
        freq.join(tots, "source")
        .groupBy("source")
        .agg(
            F.max("np").cast("bigint").alias("n_full"),
            F.max("nq").cast("bigint").alias("n_trunc"),
            F.sum(
                F.expr(
                    f"abs({_DEC.format(x='cp')} * nq - {_DEC.format(x='cq')} * np)"
                )
            ).alias("num"),
        )
    )
    return red.selectExpr(
        "source",
        "n_full",
        "n_trunc",
        "cast(floor(1e6 * cast(num as double)"
        " / (2.0 * cast(n_full as double) * cast(n_trunc as double)) + 0.5)"
        " as bigint) AS tv_micro",
    ).orderBy("source")


_ORACLE_DRIFT = f"""
WITH tok AS (
  SELECT source, u.s.tok AS tok, u.s.pos AS pos
  FROM (
    SELECT source,
           list_transform({_DUCK_TOK},
                          (t, i) -> {{'tok': t, 'pos': i - 1}}) AS lst
    FROM documents
  ), unnest(lst) AS u(s)
),
freq AS (
  SELECT source, tok, count(*)::BIGINT AS cp,
         sum(CASE WHEN pos < {_DRIFT_L} THEN 1 ELSE 0 END)::BIGINT AS cq
  FROM tok GROUP BY 1, 2
),
tots AS (
  SELECT source, sum(cp)::BIGINT AS np, sum(cq)::BIGINT AS nq
  FROM freq GROUP BY 1
),
red AS (
  SELECT f.source, max(np)::BIGINT AS n_full, max(nq)::BIGINT AS n_trunc,
         sum(abs(cp::HUGEINT * nq - cq::HUGEINT * np)) AS num
  FROM freq f JOIN tots t ON f.source = t.source
  GROUP BY f.source
)
SELECT source, n_full, n_trunc,
       cast(floor(1e6 * cast(num AS DOUBLE)
            / (2.0 * cast(n_full AS DOUBLE) * cast(n_trunc AS DOUBLE)) + 0.5)
            AS BIGINT) AS tv_micro
FROM red ORDER BY source
"""


# --------------------------------------------------------------------------
# T5 span-corruption plan (X8 [EXT])
# --------------------------------------------------------------------------


def q_span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X8 T5-style span-corruption budget (Raffel et al. 2020
    §3.1.4: 15% mask rate, mean span 3): per document of n tokens,
    n_masked = round(0.15*n), n_spans = round(n_masked/3) (>=1 when
    anything is masked), encoder input length n - n_masked + n_spans
    (each span collapses to one sentinel) and target length
    n_masked + n_spans + 1 (sentinels + EOS). All counts are EXACT
    integer forms ((n*{r} + 50) div 100; (2m + {s}) div {s2}) — no
    floats until the final ratio. The sizing arithmetic a pretraining
    batch planner runs corpus-wide. Output per source: source, n_docs,
    tokens, masked, spans, input_len, target_len,
    target_ratio_micro."""
    d = _t(spark, sf_dir, "documents")
    plan = d.select(
        "source", F.expr(f"size({_TOK})").cast("bigint").alias("n")
    ).selectExpr(
        "source",
        "n",
        f"(n * {_SPAN_RATE_PCT} + 50) div 100 AS m",
    ).selectExpr(
        "source",
        "n",
        "m",
        f"if(m = 0, 0L, greatest(1L, (2 * m + {_SPAN_MEAN}) div {2 * _SPAN_MEAN}))"
        " AS sp",
    )
    agg = plan.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n").cast("bigint").alias("tokens"),
        F.sum("m").cast("bigint").alias("masked"),
        F.sum("sp").cast("bigint").alias("spans"),
        F.sum(F.expr("n - m + sp")).cast("bigint").alias("input_len"),
        F.sum(F.expr("m + sp + 1")).cast("bigint").alias("target_len"),
    )
    return agg.selectExpr(
        "source",
        "n_docs",
        "tokens",
        "masked",
        "spans",
        "input_len",
        "target_len",
        "cast(floor(1e6 * cast(target_len as double) / cast(tokens as double)"
        " + 0.5) as bigint) AS target_ratio_micro",
    ).orderBy("source")


_ORACLE_SPAN = f"""
WITH plan AS (
  SELECT source, n, m,
         CASE WHEN m = 0 THEN 0
              ELSE greatest(1, (2 * m + {_SPAN_MEAN}) // {2 * _SPAN_MEAN}) END
           AS sp
  FROM (
    SELECT source, n, (n * {_SPAN_RATE_PCT} + 50) // 100 AS m
    FROM (SELECT source, len({_DUCK_TOK})::BIGINT AS n FROM documents)
  )
),
agg AS (
  SELECT source, count(*)::BIGINT AS n_docs, sum(n)::BIGINT AS tokens,
         sum(m)::BIGINT AS masked, sum(sp)::BIGINT AS spans,
         sum(n - m + sp)::BIGINT AS input_len,
         sum(m + sp + 1)::BIGINT AS target_len
  FROM plan GROUP BY 1
)
SELECT source, n_docs, tokens, masked, spans, input_len, target_len,
       cast(floor(1e6 * cast(target_len AS DOUBLE) / cast(tokens AS DOUBLE)
            + 0.5) AS BIGINT) AS target_ratio_micro
FROM agg ORDER BY source
"""


# --------------------------------------------------------------------------
# Hard-negative mining (X3 [EXT])
# --------------------------------------------------------------------------


def q_hard_negative_mining_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """[EXT] X3 contrastive hard-negative mining: for each of the {k}
    anchor embeddings (smallest vec_ids — a LIMIT-bounded keyset), the
    single most-similar embedding with a DIFFERENT label: the negative
    a contrastive trainer most needs in the anchor's batch. Cosine is
    rounded to 6 decimals (the similarity_topk_cosine determinism
    convention); per-anchor top-1 breaks ties on smallest negative id.
    At 100 TB the anchor keyset stays k rows, so the scored join is
    k*N reduced per anchor — never all-pairs."""
    e = _t(spark, sf_dir, "embeddings")
    anchors = (
        e.orderBy("vec_id")
        .limit(_HN_K)
        .select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("anchor_label"),
            F.expr("cast(embedding as array<double>)").alias("av"),
        )
    )
    cands = e.select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        F.expr("cast(embedding as array<double>)").alias("bv"),
    )
    scored = anchors.join(
        cands, F.col("anchor_label") != F.col("neg_label")
    ).selectExpr(
        "anchor_id",
        "anchor_label",
        "neg_id",
        "neg_label",
        "round(aggregate("
        "  zip_with(av, bv, (x, y) -> named_struct('d', x * y, 'na', x * x, 'nb', y * y)),"
        "  named_struct('d', cast(0.0 as double), 'na', cast(0.0 as double),"
        "               'nb', cast(0.0 as double)),"
        "  (acc, s) -> named_struct('d', acc.d + s.d, 'na', acc.na + s.na,"
        "              'nb', acc.nb + s.nb),"
        "  acc -> acc.d / (sqrt(acc.na) * sqrt(acc.nb))"
        "), 6) AS cosine",
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("neg_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("anchor_id", "anchor_label", "neg_id", "neg_label", "cosine")
        .orderBy("anchor_id")
    )


_ORACLE_HN = f"""
WITH anchors AS (
  SELECT vec_id AS anchor_id, label AS anchor_label,
         embedding::DOUBLE[] AS av
  FROM embeddings ORDER BY vec_id LIMIT {_HN_K}
),
scored AS (
  SELECT a.anchor_id, a.anchor_label, e.vec_id AS neg_id,
         e.label AS neg_label,
         round(list_cosine_similarity(a.av, e.embedding::DOUBLE[]), 6)
           AS cosine
  FROM anchors a JOIN embeddings e ON a.anchor_label <> e.label
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY anchor_id
             ORDER BY cosine DESC, neg_id ASC) AS rn
  FROM scored
)
SELECT anchor_id, anchor_label, neg_id, neg_label, cosine
FROM ranked WHERE rn = 1 ORDER BY anchor_id
"""


REGISTRY_EXT129: dict[str, QuerySpec] = {
    "truncation_loss_curve": QuerySpec(
        q_truncation_loss_curve, _ORACLE_TRUNC, "X8 [EXT] truncation curve"
    ),
    "truncation_content_drift": QuerySpec(
        q_truncation_content_drift, _ORACLE_DRIFT, "X6 [EXT] truncation drift"
    ),
    "span_corruption_plan": QuerySpec(
        q_span_corruption_plan, _ORACLE_SPAN, "X8 [EXT] span corruption"
    ),
    "hard_negative_mining_topk": QuerySpec(
        q_hard_negative_mining_topk, _ORACLE_HN, "X3 [EXT] hard negatives"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_truncation_content_drift.__doc__ = q_truncation_content_drift.__doc__.format(l=_DRIFT_L)  # noqa: E501
q_span_corruption_plan.__doc__ = q_span_corruption_plan.__doc__.format(r=_SPAN_RATE_PCT, s=_SPAN_MEAN, s2=2 * _SPAN_MEAN)  # noqa: E501
q_hard_negative_mining_topk.__doc__ = q_hard_negative_mining_topk.__doc__.format(k=_HN_K)  # noqa: E501
