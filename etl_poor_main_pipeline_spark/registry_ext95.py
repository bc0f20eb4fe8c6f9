"""Operator registry, wave 96: corpus-coverage statistics — Good-Turing
unseen-probability mass, Chao1 vocabulary-richness estimation, and the
vocabulary coverage curve (types needed for p% of token mass).

Scale stances:
- All three reduce the corpus to the COUNT-OF-COUNTS frame S(r) =
  #types with frequency r (one tokenize + two grouped aggregates);
  everything after is bounded by the frequency DOMAIN, not the corpus.
- The coverage curve needs cumulative mass/type counts over descending
  frequency — computed with scan_prefix.exclusive_prefix_sum (Blelloch,
  no unpartitioned window) on the negated-frequency key; the oracle
  keeps the literal global-window SQL.

Reference parity: none; [EXT] X6/X7 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.scan_prefix import exclusive_prefix_sum
from .registry import QuerySpec, _t

_TOK = r"filter(split(lower(text), '\\s+'), t -> t <> '')"
_DUCK_TOK = r"list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')"

_GT_RS = [1, 2, 3, 4, 5]


def _freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram type frequencies. Trigrams, not unigrams: the template
    corpus has only ~31 unigram types, all frequent (S(1) = 0 — every
    tail estimator degenerates); trigrams carry a real singleton tail
    at every SF."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.expr(_TOK).alias("ts")).where(F.size("ts") >= 3)
    return (
        toks.select(
            F.expr(
                "explode(transform(sequence(1, size(ts) - 2),"
                " i -> concat_ws(' ', element_at(ts, i), element_at(ts, i + 1),"
                " element_at(ts, i + 2))))"
            ).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )


# --------------------------------------------------------------------------
# Good-Turing unseen mass + adjusted counts (X6 [EXT])
# --------------------------------------------------------------------------


def q_good_turing_unseen_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6 Good-Turing frequency re-estimation: from the
    count-of-counts S(r), the probability the NEXT trigram is an unseen
    type is P0 = S(1)/N (Turing's estimate — the number a crawler
    watches to know whether a source still yields new vocabulary), and
    the adjusted count r* = (r+1) S(r+1)/S(r) for r = {rs} (the
    smoothing inside every classical n-gram LM). One row per r with
    the global stats alongside; the corpus reduces to S(r) in two
    aggregates."""
    fr = _freqs(spark, sf_dir)
    soc = fr.groupBy("f").agg(F.count(F.lit(1)).cast("bigint").alias("s"))
    glob = fr.agg(
        F.sum("f").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("v_types"),
    )
    rs = ", ".join(str(r) for r in _GT_RS)
    grid = glob.selectExpr("n_tokens", "v_types", f"explode(array({rs})) as r")
    return (
        grid.join(F.broadcast(soc.selectExpr("f as r", "s as s_r")), "r", "left")
        .join(
            F.broadcast(soc.selectExpr("f - 1 as r", "s as s_r1")), "r", "left"
        )
        .selectExpr(
            "cast(r as bigint) as r",
            "n_tokens",
            "v_types",
            "coalesce(s_r, 0) as s_r",
            "coalesce(s_r1, 0) as s_r_plus_1",
            "CASE WHEN coalesce(s_r, 0) > 0 THEN"
            " cast(floor(1e3 * cast(r + 1 as double) * cast(coalesce(s_r1, 0) as double)"
            " / cast(s_r as double) + 0.5) as bigint) ELSE -1 END as r_star_milli",
        )
        .join(
            F.broadcast(
                # keyless aggregate: never empty even when S(1) = 0
                soc.agg(
                    F.sum(F.when(F.col("f") == 1, F.col("s")).otherwise(0))
                    .cast("bigint")
                    .alias("s1")
                )
                .crossJoin(glob)
                .selectExpr(
                    "cast(floor(1e6 * cast(s1 as double) / cast(n_tokens as double)"
                    " + 0.5) as bigint) as p_unseen_micro"
                )
            ),
            how="cross",
        )
        .orderBy("r")
    )


_ORACLE_GT = rf"""
WITH fr AS (
  SELECT t, count(*)::BIGINT AS f FROM (
    SELECT ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS t
    FROM (SELECT {_DUCK_TOK} AS ts FROM documents), range(1, 100000) r(i)
    WHERE len(ts) >= 3 AND i <= len(ts) - 2
  ) GROUP BY t
),
soc AS (SELECT f, count(*)::BIGINT AS s FROM fr GROUP BY f),
gtot AS (
  SELECT sum(f)::BIGINT AS n_tokens, count(*)::BIGINT AS v_types FROM fr
),
grid AS (
  SELECT n_tokens, v_types, r
  FROM gtot, (SELECT unnest([{", ".join(str(r) for r in _GT_RS)}]) AS r)
),
p0 AS (
  SELECT cast(floor(1e6 * cast(s1 AS double) / cast(n_tokens AS double) + 0.5)
         AS bigint) AS p_unseen_micro
  FROM (SELECT sum(CASE WHEN f = 1 THEN s ELSE 0 END)::BIGINT AS s1 FROM soc)
  CROSS JOIN gtot
)
SELECT cast(r AS bigint) AS r, n_tokens, v_types,
       coalesce(a.s, 0) AS s_r,
       coalesce(b.s, 0) AS s_r_plus_1,
       CASE WHEN coalesce(a.s, 0) > 0 THEN
         cast(floor(1e3 * cast(r + 1 AS double) * cast(coalesce(b.s, 0) AS double)
              / cast(a.s AS double) + 0.5) AS bigint)
       ELSE -1 END AS r_star_milli,
       p_unseen_micro
FROM grid
LEFT JOIN soc a ON a.f = grid.r
LEFT JOIN soc b ON b.f = grid.r + 1
CROSS JOIN p0
ORDER BY r
"""


# --------------------------------------------------------------------------
# Chao1 vocabulary richness (X6/X7 [EXT])
# --------------------------------------------------------------------------


def q_chao1_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6/X7 Chao1 richness estimate of the TRUE trigram-vocabulary size
    from singleton/doubleton counts: chao1 = V + N1(N1-1)/(2(N2+1))
    (bias-corrected, finite when N2 = 0), with sample coverage
    C = 1 - N1/N (Turing). chao1/V >> 1 says the corpus has barely
    scratched its source's vocabulary — crawl more; near 1 says the
    vocabulary is exhausted — the same decision Heaps' beta informs,
    from a different estimator. Two aggregates over the
    count-of-counts frame."""
    fr = _freqs(spark, sf_dir)
    stats = fr.agg(
        F.sum("f").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("v_types"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("f") == 2, 1).otherwise(0)).cast("bigint").alias("n2"),
    )
    return stats.selectExpr(
        "n_tokens",
        "v_types",
        "n1",
        "n2",
        "cast(floor(cast(v_types as double)"
        " + cast(n1 as double) * cast(n1 - 1 as double)"
        " / (2.0 * cast(n2 + 1 as double)) + 0.5) as bigint) as chao1_est",
        "cast(floor(1e6 * (1.0 - cast(n1 as double) / cast(n_tokens as double))"
        " + 0.5) as bigint) as coverage_micro",
    )


_ORACLE_CHAO1 = rf"""
WITH fr AS (
  SELECT t, count(*)::BIGINT AS f FROM (
    SELECT ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS t
    FROM (SELECT {_DUCK_TOK} AS ts FROM documents), range(1, 100000) r(i)
    WHERE len(ts) >= 3 AND i <= len(ts) - 2
  ) GROUP BY t
),
stats AS (
  SELECT sum(f)::BIGINT AS n_tokens, count(*)::BIGINT AS v_types,
         sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(CASE WHEN f = 2 THEN 1 ELSE 0 END)::BIGINT AS n2
  FROM fr
)
SELECT n_tokens, v_types, n1, n2,
       cast(floor(cast(v_types AS double)
            + cast(n1 AS double) * cast(n1 - 1 AS double)
            / (2.0 * cast(n2 + 1 AS double)) + 0.5) AS bigint) AS chao1_est,
       cast(floor(1e6 * (1.0 - cast(n1 AS double) / cast(n_tokens AS double))
            + 0.5) AS bigint) AS coverage_micro
FROM stats
"""


# --------------------------------------------------------------------------
# Vocabulary coverage curve (X6/X7 [EXT])
# --------------------------------------------------------------------------

_COV_PS = [50, 90, 99]


def q_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6/X7 vocabulary coverage curve: the number of trigram
    types (taken most-frequent-first) needed to cover p% of all trigram
    mass, for p = {ps} — the curve that sizes a tokenizer's vocab and
    quantifies how head-heavy a corpus is. Works on the count-of-counts
    frame: per distinct frequency f, S(f) types carry f*S(f) mass;
    cumulative mass/types over DESCENDING f come from
    scan_prefix.exclusive_prefix_sum on the negated-frequency key (no
    unpartitioned window; the frame is frequency-domain-bounded); the
    crossing bin yields the exact type count with within-bin division
    (types in a bin are exchangeable — each carries exactly f
    tokens)."""
    fr = _freqs(spark, sf_dir)
    soc = fr.groupBy("f").agg(F.count(F.lit(1)).cast("bigint").alias("s"))
    binm = soc.selectExpr("f", "s", "-f as nk", "f * s as mass")
    pre_mass = exclusive_prefix_sum(binm, "nk", "mass", out="pmass").select(
        "nk", "pmass"
    )
    pre_types = exclusive_prefix_sum(binm, "nk", "s", out="ptypes").select(
        F.col("nk").alias("nk2"), "ptypes"
    )
    cum = (
        binm.join(pre_mass, "nk")
        .join(pre_types, F.col("nk") == F.col("nk2"))
        .select("f", "s", "mass", "pmass", "ptypes")
    )
    tot = fr.agg(F.sum("f").cast("bigint").alias("n_tokens"))
    ps = ", ".join(str(p) for p in _COV_PS)
    targets = tot.selectExpr(
        "n_tokens", f"explode(array({ps})) as p_pct"
    ).selectExpr(
        "n_tokens",
        "p_pct",
        # ceil so the target mass is an integer token count
        "cast(ceil(cast(p_pct as double) / 100.0 * n_tokens) as bigint) as target",
    )
    return (
        cum.crossJoin(F.broadcast(targets))
        .where((F.col("pmass") < F.col("target")) & (F.col("pmass") + F.col("mass") >= F.col("target")))
        .selectExpr(
            "cast(p_pct as bigint) as p_pct",
            "n_tokens",
            "ptypes + cast(ceil(cast(target - pmass as double) / cast(f as double))"
            " as bigint) as types_needed",
        )
        .orderBy("p_pct")
    )


_ORACLE_COVERAGE = rf"""
WITH fr AS (
  SELECT t, count(*)::BIGINT AS f FROM (
    SELECT ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS t
    FROM (SELECT {_DUCK_TOK} AS ts FROM documents), range(1, 100000) r(i)
    WHERE len(ts) >= 3 AND i <= len(ts) - 2
  ) GROUP BY t
),
soc AS (SELECT f, count(*)::BIGINT AS s FROM fr GROUP BY f),
cum AS (
  SELECT f, s, f * s AS mass,
         coalesce(sum(f * s) OVER (ORDER BY f DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pmass,
         coalesce(sum(s) OVER (ORDER BY f DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ptypes
  FROM soc
),
tot AS (SELECT sum(f)::BIGINT AS n_tokens FROM fr),
targets AS (
  SELECT n_tokens, p_pct,
         cast(ceil(cast(p_pct AS double) / 100.0 * n_tokens) AS bigint) AS target
  FROM tot, (SELECT unnest([{", ".join(str(p) for p in _COV_PS)}]) AS p_pct)
)
SELECT cast(p_pct AS bigint) AS p_pct, n_tokens,
       (ptypes + cast(ceil(cast(target - pmass AS double) / cast(f AS double))
           AS bigint))::BIGINT AS types_needed
FROM cum CROSS JOIN targets
WHERE pmass < target AND pmass + mass >= target
ORDER BY p_pct
"""


REGISTRY_EXT95: dict[str, QuerySpec] = {
    "good_turing_unseen_mass": QuerySpec(
        q_good_turing_unseen_mass, _ORACLE_GT, "X6 [EXT] GT re-estimation"
    ),
    "chao1_vocab_richness": QuerySpec(
        q_chao1_vocab_richness, _ORACLE_CHAO1, "X6/X7 [EXT] richness estimate"
    ),
    "vocab_coverage_curve": QuerySpec(
        q_vocab_coverage_curve, _ORACLE_COVERAGE, "X6/X7 [EXT] coverage curve"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_good_turing_unseen_mass.__doc__ = q_good_turing_unseen_mass.__doc__.format(rs=_GT_RS)  # noqa: E501
q_vocab_coverage_curve.__doc__ = q_vocab_coverage_curve.__doc__.format(ps=_COV_PS)  # noqa: E501
