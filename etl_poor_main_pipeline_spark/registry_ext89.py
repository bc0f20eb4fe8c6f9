"""Operator registry, wave 90: corpus-composition tier — Jensen-Shannon
source divergence (the domain-mixing distance), interpolated Kneser-Ney
bigram smoothing (the n-gram LM the MLE/add-one scorers approximate), and
a Heaps'-law vocabulary-growth audit.

Scale stances:
- JSD: per-(source, token) probabilities are one grouped aggregate; the
  union-support grid is vocab x n_sources rows (sources are a small enum),
  and the pair frame joins that grid to itself ON TOKEN (equi, partition-
  parallel) with source inequality only as a post-filter inside the
  token's S-row group — never an unblocked cross of the corpus.
- Kneser-Ney: every KN term (discounted bigram MLE, continuation mass,
  forward/backward type counts) is a grouped count over the bigram-type
  table, which is vocab^2-bounded, not corpus-bounded; top-30 lands via
  TakeOrdered.
- Heaps: the deterministic document order comes from
  ``scan_prefix.global_rank_zero`` (no global window anywhere); per-token
  first-occurrence is a min aggregate; the decile curve joins token/doc
  frames to a broadcast 10-row spine.

ln() is the only transcendental; both engines evaluate it on identical
doubles and every ln-sum runs through decimal(38,16) before the final
micro-round (the repo's FP determinism convention, see registry._dsum and
the wave-22 bigram scorer).

Reference parity: none; [EXT] X6/X7 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.dedup import spread
from .operators.scan_prefix import global_rank_zero
from .registry import QuerySpec, _t

_TOK = r"filter(split(lower(text), '\\s+'), t -> t <> '')"
_DUCK_TOK = r"list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')"


# --------------------------------------------------------------------------
# Jensen-Shannon divergence between source unigram distributions (X7 [EXT])
# --------------------------------------------------------------------------


def q_jsd_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 corpus-composition distance: pairwise Jensen-Shannon
    divergence (nats, micro-int) between the unigram token distributions
    of every pair of document sources — the symmetric, bounded distance
    data-mixing recipes use to pick domain weights and detect when two
    "different" sources are really the same crawl. For each source pair
    (a < b): JSD = 0.5*sum p*ln(2p/(p+q)) + 0.5*sum q*ln(2q/(p+q)) over
    the union support (one-sided tokens contribute p*ln(2)). The union
    support comes from a vocab x sources grid (sources are a small enum)
    left-joined to the per-source probabilities; the pair frame is an
    equi-join on token. ln terms sum through decimal(38,16)."""
    d = spread(_t(spark, sf_dir, "documents"))
    tok = d.select("source", F.explode(F.expr(_TOK)).alias("t"))
    cnt = tok.groupBy("source", "t").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = cnt.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    p = cnt.join(F.broadcast(tot), "source").select(
        "source", "t", (F.col("c").cast("double") / F.col("n").cast("double")).alias("p")
    )
    vocab = cnt.select("t").distinct()
    # `source` is a small enum (tens of values); the limit never truncates in
    # practice and makes the vocab x sources cross provably bounded for the
    # nested-loop plan guard (plans/explain.py).
    sources = tot.select("source").limit(1024)
    grid = (
        vocab.crossJoin(F.broadcast(sources))
        .join(p, ["source", "t"], "left")
        .select("source", "t", F.coalesce(F.col("p"), F.lit(0.0)).alias("p"))
    )
    a = grid.select(
        F.col("source").alias("src_a"), F.col("t").alias("t"), F.col("p").alias("pa")
    )
    b = grid.select(
        F.col("source").alias("src_b"), F.col("t").alias("tb"), F.col("p").alias("pb")
    )
    pairs = (
        a.join(b, (F.col("t") == F.col("tb")) & (F.col("src_a") < F.col("src_b")))
        .where((F.col("pa") > 0) | (F.col("pb") > 0))
        .selectExpr(
            "src_a",
            "src_b",
            "cast(0.5 * (CASE WHEN pa > 0 THEN pa * ln(2.0 * pa / (pa + pb)) ELSE 0.0 END)"
            " + 0.5 * (CASE WHEN pb > 0 THEN pb * ln(2.0 * pb / (pa + pb)) ELSE 0.0 END)"
            " as decimal(38,16)) as term",
            "CASE WHEN pa > 0 AND pb > 0 THEN 1 ELSE 0 END as both_",
        )
    )
    return (
        pairs.groupBy("src_a", "src_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("union_tokens"),
            F.sum("both_").cast("bigint").alias("shared_tokens"),
            F.floor(F.lit(1000000.0) * F.sum("term").cast("double") + F.lit(0.5))
            .cast("bigint")
            .alias("jsd_micro"),
        )
        .orderBy("src_a", "src_b")
    )


_ORACLE_JSD = rf"""
WITH tok AS (
  SELECT source, unnest({_DUCK_TOK}) AS t FROM documents
),
cnt AS (SELECT source, t, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2),
tot AS (SELECT source, sum(c)::BIGINT AS n FROM cnt GROUP BY 1),
p AS (
  SELECT cnt.source, cnt.t, cast(c AS double) / cast(n AS double) AS p
  FROM cnt JOIN tot USING (source)
),
grid AS (
  SELECT s.source, v.t, coalesce(p.p, 0.0) AS p
  FROM (SELECT DISTINCT t FROM cnt) v
  CROSS JOIN (SELECT source FROM tot) s
  LEFT JOIN p ON p.source = s.source AND p.t = v.t
),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b,
         cast(0.5 * (CASE WHEN a.p > 0 THEN a.p * ln(2.0 * a.p / (a.p + b.p)) ELSE 0.0 END)
            + 0.5 * (CASE WHEN b.p > 0 THEN b.p * ln(2.0 * b.p / (a.p + b.p)) ELSE 0.0 END)
            AS decimal(38,16)) AS term,
         CASE WHEN a.p > 0 AND b.p > 0 THEN 1 ELSE 0 END AS both_
  FROM grid a JOIN grid b ON a.t = b.t AND a.source < b.source
  WHERE a.p > 0 OR b.p > 0
)
SELECT src_a, src_b,
       count(*)::BIGINT AS union_tokens,
       sum(both_)::BIGINT AS shared_tokens,
       cast(floor(1000000.0 * cast(sum(term) AS double) + 0.5) AS bigint) AS jsd_micro
FROM pairs GROUP BY 1, 2 ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram LM (X6 [EXT])
# --------------------------------------------------------------------------

_KN_D = "0.75"  # absolute discount


def q_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6 interpolated Kneser-Ney bigram probabilities — the
    smoothing the MLE (bigram_logprob) scorer approximates, and the one
    production n-gram LMs (KenLM) actually use: P(w2|w1) =
    max(c(w1w2)-d,0)/c(w1.) + d*N1+(w1.)/c(w1.) * N1+(.w2)/N1+(..),
    where the continuation probability counts bigram TYPES, not tokens
    (a word seen in many contexts deserves more backoff mass). d = {d}.
    All four KN terms are grouped counts over the bigram-type table
    (vocab^2-bounded); output = top 30 bigrams by probability with a
    (w1, w2) tiebreak, as 1e6 micro-ints."""
    d = spread(_t(spark, sf_dir, "documents"))
    toks = d.select(F.expr(_TOK).alias("ts")).where(F.size("ts") >= 2)
    bi = toks.select(
        F.expr(
            "explode(transform(sequence(1, size(ts) - 1),"
            " i -> struct(element_at(ts, i) as w1, element_at(ts, i + 1) as w2)))"
        ).alias("b")
    ).select("b.w1", "b.w2")
    c2 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
    # per-w1: token count and distinct-continuation (type) count
    fwd = c2.groupBy("w1").agg(
        F.sum("c2").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("n1_fwd"),
    )
    # per-w2: distinct-history type count (continuation numerator)
    back = c2.groupBy("w2").agg(F.count(F.lit(1)).cast("bigint").alias("n1_back"))
    nbb = c2.agg(F.count(F.lit(1)).cast("bigint").alias("n_bb"))
    kn = (
        c2.join(fwd, "w1")
        .join(back, "w2")
        .crossJoin(F.broadcast(nbb))
        .selectExpr(
            "w1",
            "w2",
            "c2",
            f"(cast(c2 as double) - {_KN_D}) / cast(c1 as double)"
            f" + {_KN_D} * cast(n1_fwd as double) / cast(c1 as double)"
            " * (cast(n1_back as double) / cast(n_bb as double)) as p_kn",
        )
    )
    return (
        kn.select(
            "w1",
            "w2",
            F.col("c2").alias("pair_count"),
            F.floor(F.lit(1000000.0) * F.col("p_kn") + F.lit(0.5))
            .cast("bigint")
            .alias("p_kn_micro"),
        )
        .orderBy(F.col("p_kn_micro").desc(), "w1", "w2")
        .limit(30)
    )


_ORACLE_KN = rf"""
WITH toks AS (
  SELECT {_DUCK_TOK} AS ts FROM documents
),
bi AS (
  SELECT ts[i] AS w1, ts[i + 1] AS w2
  FROM toks, range(1, 100000) t(i)
  WHERE len(ts) >= 2 AND i <= len(ts) - 1
),
c2 AS (SELECT w1, w2, count(*)::BIGINT AS c2 FROM bi GROUP BY 1, 2),
fwd AS (SELECT w1, sum(c2)::BIGINT AS c1, count(*)::BIGINT AS n1_fwd FROM c2 GROUP BY 1),
back AS (SELECT w2, count(*)::BIGINT AS n1_back FROM c2 GROUP BY 1),
nbb AS (SELECT count(*)::BIGINT AS n_bb FROM c2)
SELECT w1, w2, c2 AS pair_count,
       cast(floor(1000000.0 * (
         (cast(c2 AS double) - {_KN_D}) / cast(c1 AS double)
         + {_KN_D} * cast(n1_fwd AS double) / cast(c1 AS double)
           * (cast(n1_back AS double) / cast(n_bb AS double))
       ) + 0.5) AS bigint) AS p_kn_micro
FROM c2 JOIN fwd USING (w1) JOIN back USING (w2) CROSS JOIN nbb
ORDER BY p_kn_micro DESC, w1, w2
LIMIT 30
"""


# --------------------------------------------------------------------------
# Heaps'-law vocabulary growth curve (X7 [EXT])
# --------------------------------------------------------------------------


def q_heaps_law_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 vocabulary-growth audit: order documents by the
    deterministic md5(doc_id) shuffle, measure cumulative vocabulary
    V(n) against cumulative token count n at each corpus decile, and
    fit the Heaps'-law exponent beta (V ~ K * n^beta) by log-log OLS
    over the 10 checkpoints — the curve that says whether a corpus is
    still contributing new types (beta ~ 0.5) or has gone repetitive
    (beta -> 0), i.e. whether crawling MORE of this source buys
    vocabulary. Document ranks come from scan_prefix.global_rank_zero
    (no global window); V(n) is a per-token min-rank aggregate joined
    to a broadcast 10-row decile spine; beta is a closed-form OLS over
    the 10-row curve, repeated on each output row."""
    d = spread(_t(spark, sf_dir, "documents")).select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        F.expr(_TOK).alias("ts"),
    )
    # rank the slim (doc_id, h) frame — range-shuffling the token arrays
    # through the rank machinery would move the whole corpus twice
    slim = d.select("doc_id", "h")
    ranks = global_rank_zero(slim, ["h", "doc_id"], 8, out="r0").select(
        "doc_id", "r0"
    )
    ranked = d.join(ranks, "doc_id")
    n_docs = ranks.agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    spine = (
        n_docs.selectExpr("nd", "explode(sequence(1, 10)) as decile")
        .selectExpr("decile", "cast(ceil(cast(decile as double) * nd / 10.0) as bigint) as thr")
    )
    # cumulative token instances at each checkpoint
    doc_tok = ranked.select("r0", F.size("ts").cast("bigint").alias("n_tok"))
    cum_tok = (
        doc_tok.crossJoin(F.broadcast(spine))
        .where(F.col("r0") < F.col("thr"))
        .groupBy("decile")
        .agg(F.sum("n_tok").cast("bigint").alias("n_tokens"))
    )
    # first-occurrence rank per token type -> cumulative vocabulary
    first = (
        ranked.select("r0", F.explode("ts").alias("t"))
        .groupBy("t")
        .agg(F.min("r0").alias("fr"))
    )
    cum_voc = (
        first.crossJoin(F.broadcast(spine))
        .where(F.col("fr") < F.col("thr"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).cast("bigint").alias("vocab"))
    )
    curve = cum_tok.join(cum_voc, "decile").selectExpr(
        "decile",
        "n_tokens",
        "vocab",
        "ln(cast(n_tokens as double)) as x",
        "ln(cast(vocab as double)) as y",
    )
    ols = curve.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum(F.col("x").cast("decimal(38,16)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,16)")).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,16)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,16)")).alias("sxx"),
    ).selectExpr(
        "cast(floor(1000000.0 * (cast(sxy as double) - cast(sx as double) * cast(sy as double) / k)"
        " / (cast(sxx as double) - cast(sx as double) * cast(sx as double) / k) + 0.5) as bigint)"
        " as heaps_beta_micro"
    )
    return (
        curve.select("decile", "n_tokens", "vocab")
        .crossJoin(F.broadcast(ols))
        .orderBy("decile")
    )


_ORACLE_HEAPS = rf"""
WITH d AS (
  SELECT doc_id, md5(cast(doc_id AS varchar)) AS h, {_DUCK_TOK} AS ts
  FROM documents
),
ranked AS (
  SELECT doc_id, ts, row_number() OVER (ORDER BY h, doc_id) - 1 AS r0 FROM d
),
nd AS (SELECT count(*)::BIGINT AS nd FROM ranked),
spine AS (
  SELECT decile, cast(ceil(cast(decile AS double) * nd / 10.0) AS bigint) AS thr
  FROM nd, (SELECT unnest(range(1, 11)) AS decile)
),
cum_tok AS (
  SELECT decile, sum(len(ts))::BIGINT AS n_tokens
  FROM ranked CROSS JOIN spine WHERE r0 < thr GROUP BY decile
),
first_occ AS (
  SELECT t, min(r0) AS fr
  FROM (SELECT r0, unnest(ts) AS t FROM ranked) GROUP BY t
),
cum_voc AS (
  SELECT decile, count(*)::BIGINT AS vocab
  FROM first_occ CROSS JOIN spine WHERE fr < thr GROUP BY decile
),
curve AS (
  SELECT decile, n_tokens, vocab,
         ln(cast(n_tokens AS double)) AS x, ln(cast(vocab AS double)) AS y
  FROM cum_tok JOIN cum_voc USING (decile)
),
ols AS (
  SELECT cast(floor(1000000.0
           * (cast(sum(cast(x * y AS decimal(38,16))) AS double)
              - cast(sum(cast(x AS decimal(38,16))) AS double)
                * cast(sum(cast(y AS decimal(38,16))) AS double) / count(*))
           / (cast(sum(cast(x * x AS decimal(38,16))) AS double)
              - cast(sum(cast(x AS decimal(38,16))) AS double)
                * cast(sum(cast(x AS decimal(38,16))) AS double) / count(*))
           + 0.5) AS bigint) AS heaps_beta_micro
  FROM curve
)
SELECT decile, n_tokens, vocab, heaps_beta_micro
FROM curve CROSS JOIN ols ORDER BY decile
"""


REGISTRY_EXT89: dict[str, QuerySpec] = {
    "jsd_source_divergence": QuerySpec(
        q_jsd_source_divergence, _ORACLE_JSD, "X7 [EXT] domain-mixing JSD"
    ),
    "kneser_ney_bigram": QuerySpec(
        q_kneser_ney_bigram, _ORACLE_KN, "X6 [EXT] interpolated KN bigram LM"
    ),
    "heaps_law_vocab_growth": QuerySpec(
        q_heaps_law_vocab_growth, _ORACLE_HEAPS, "X7 [EXT] Heaps-law vocab curve"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_kneser_ney_bigram.__doc__ = q_kneser_ney_bigram.__doc__.format(d=_KN_D)  # noqa: E501
