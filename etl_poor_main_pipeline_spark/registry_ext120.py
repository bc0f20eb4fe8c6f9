"""Wave 120 [EXT]: rank-based two-sample completers (Brunner-Munzel,
Cliff's delta / Vargha-Delaney A) and two text-curation members (SMOG
grade, hapax/Sichel vocabulary profile).

Scale notes (the 100x question, per query):
- brunner_munzel_test / cliffs_delta_effect: both samples reduce
  map-side to CENTI VALUE CELLS; pooled and within-sample midranks are
  ONE prefix walk over those cells (the sanctioned domain-bounded
  global window of the KS/CvM/AD family), every dominance/rank count an
  exact integer in decimal(38,0)/HUGEINT. The BM variance terms square
  a decimal difference per CELL (not per row) with one micro-snap per
  term, so double summation order never differs between engines.
- smog_index: pure-expression regexp counts per document (polysyllable
  = >=3 vowel groups, the fog convention), exact-bigint per-source
  sums, one groupBy on the source enum; the sqrt/ln land on snapped
  integers.
- hapax_sichel_stats: tokens explode to (lang, token) counts (one
  shuffle, tf-idf shape); the frequency spectrum V1/V2/V and N reduce
  per lang, so token-domain cardinality never leaves the aggregate.
  ln(N) is micro-snapped IMMEDIATELY (JVM and DuckDB libm disagree in
  the last ulp on ~13% of ln inputs) before Honore's R divides it.

Reference parity: none; [EXT] X6/X7 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import QuerySpec, _t

_BM_A, _BM_B = "click", "purchase"


def _bm_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(F.col("event_type").isin(_BM_A, _BM_B))
    return (
        e.select(
            F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
            .cast("bigint")
            .alias("vc"),
            F.when(F.col("event_type") == _BM_A, F.lit(1))
            .otherwise(F.lit(0))
            .alias("isa"),
        )
        .groupBy("vc")
        .agg(
            F.sum("isa").cast("bigint").alias("ca"),
            F.sum(F.lit(1) - F.col("isa")).cast("bigint").alias("cb"),
        )
    )


_BM_CELLS_SQL = f"""
  SELECT cast(floor(value * 100.0 + 0.5) AS BIGINT) AS vc,
         sum(CASE WHEN event_type = '{_BM_A}' THEN 1 ELSE 0 END)::BIGINT AS ca,
         sum(CASE WHEN event_type = '{_BM_B}' THEN 1 ELSE 0 END)::BIGINT AS cb
  FROM events WHERE event_type IN ('{_BM_A}', '{_BM_B}')
  GROUP BY 1
"""


# --------------------------------------------------------------------------
# Brunner-Munzel test on centi value cells (X7 [EXT])
# --------------------------------------------------------------------------


def q_brunner_munzel_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Brunner-Munzel test between '{a}' and '{b}' event values —
    the heteroscedasticity-robust replacement for Mann-Whitney (it does
    NOT assume equal variances under H0, the shipped U test's blind
    spot). Tie-aware midranks come from one prefix walk over pooled
    centi cells: per cell, doubled pooled midrank R2 = 2*before + l + 1
    and doubled within-sample midrank G2 = 2*before_k + c_k + 1; the
    scipy-compatible statistic is W = n_a*n_b*(Rbar_b - Rbar_a) /
    (N * sqrt(n_a*S_a^2 + n_b*S_b^2)) with S_k^2 the variance of
    (pooled - within) midranks. Each variance term squares ONE
    decimal-staged per-cell difference with a micro-snap, so both
    engines sum identical integers. Output one row: n_a, n_b,
    p_hat_micro (common-language P(A<B)+P(=)/2), w_milli."""
    cells = _bm_cells(spark, sf_dir)
    w = Window.orderBy("vc").rowsBetween(Window.unboundedPreceding, 0)
    pref = cells.select(
        "ca",
        "cb",
        (F.sum("ca").over(w) - F.col("ca")).cast("bigint").alias("befa"),
        (F.sum("cb").over(w) - F.col("cb")).cast("bigint").alias("befb"),
    )
    tot = pref.agg(
        F.max(F.expr("befa + ca")).cast("bigint").alias("na"),
        F.max(F.expr("befb + cb")).cast("bigint").alias("nb"),
    )
    # doubled midranks per cell (exact integers): pooled R2 and within G2;
    # D = R2 - G2 is constant across a cell's members of one sample
    dec = "cast({x} as decimal(38,0))"
    terms = (
        pref.crossJoin(F.broadcast(tot))
        .select(
            "ca",
            "cb",
            "na",
            "nb",
            F.expr("2 * (befa + befb) + (ca + cb) + 1").alias("r2"),
            F.expr("2 * (befa + befb) + (ca + cb) + 1 - (2 * befa + ca + 1)")
            .cast("bigint")
            .alias("dxa"),
            F.expr("2 * (befa + befb) + (ca + cb) + 1 - (2 * befb + cb + 1)")
            .cast("bigint")
            .alias("dxb"),
        )
    )
    sums = terms.agg(
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.sum(F.expr(f"{dec.format(x='ca')} * {dec.format(x='r2')}")).alias("sra"),
        F.sum(F.expr(f"{dec.format(x='cb')} * {dec.format(x='r2')}")).alias("srb"),
        F.sum(F.expr(f"{dec.format(x='ca')} * {dec.format(x='dxa')}")).alias("ta"),
        F.sum(F.expr(f"{dec.format(x='cb')} * {dec.format(x='dxb')}")).alias("tb"),
    )
    # variance terms: S_k^2 = sum_j c_kj * (n_k*D_j - T_k)^2 / (4 n_k^2 (n_k-1))
    # (doubled midranks => /4). The squared difference stays EXACT in
    # decimal(38,0)/HUGEINT: (n_k*D_j - T_k)^2 ~ 1e24 at sf0.1, c_kj-
    # weighted sums ~ 1e31 — inside 38 digits through ~1e9-row samples
    # (beyond that the anderson_darling per-cell double-snap staging is
    # the documented fallback). No checkpoint: recomputing the tiny cells
    # frame for the second consumer is free and keeps the plan visible to
    # the broadcast/window guards.
    sq = (
        terms.crossJoin(F.broadcast(sums.select("ta", "tb")))
        .select(
            F.expr(
                f"{dec.format(x='ca')}"
                f" * ({dec.format(x='na')} * {dec.format(x='dxa')} - ta)"
                f" * ({dec.format(x='na')} * {dec.format(x='dxa')} - ta)"
            ).alias("qa"),
            F.expr(
                f"{dec.format(x='cb')}"
                f" * ({dec.format(x='nb')} * {dec.format(x='dxb')} - tb)"
                f" * ({dec.format(x='nb')} * {dec.format(x='dxb')} - tb)"
            ).alias("qb"),
        )
        .agg(F.sum("qa").alias("qa"), F.sum("qb").alias("qb"))
    )
    return (
        sums.crossJoin(F.broadcast(sq))
        .select(
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            # p_hat = (Rbar_b - (nb+1)/2) / na, from doubled sums:
            # Rbar_b = srb / (2*nb)
            F.expr(
                "cast(floor(1e6 * (cast(srb as double) / (2.0 * cast(nb as double))"
                " - (cast(nb as double) + 1.0) / 2.0) / cast(na as double)"
                " + 0.5) as bigint)"
            ).alias("p_hat_micro"),
            # S_k^2 = qk / (4 n_k^2 (n_k-1)); Rbar diff from doubled sums
            F.expr(
                "cast(floor(1e3 * (cast(na as double) * cast(nb as double)"
                " * (cast(srb as double) / (2.0 * cast(nb as double))"
                "    - cast(sra as double) / (2.0 * cast(na as double))))"
                " / ((cast(na as double) + cast(nb as double))"
                "    * sqrt(cast(na as double) * (cast(qa as double)"
                "             / (4.0 * cast(na as double) * cast(na as double)"
                "                * (cast(na as double) - 1.0)))"
                "         + cast(nb as double) * (cast(qb as double)"
                "             / (4.0 * cast(nb as double) * cast(nb as double)"
                "                * (cast(nb as double) - 1.0)))))"
                " + 0.5) as bigint)"
            ).alias("w_milli"),
        )
    )


_ORACLE_BM = f"""
WITH cells AS ({_BM_CELLS_SQL}),
pref AS (
  SELECT ca, cb,
         (sum(ca) OVER (ORDER BY vc) - ca)::BIGINT AS befa,
         (sum(cb) OVER (ORDER BY vc) - cb)::BIGINT AS befb
  FROM cells
),
tot AS (SELECT max(befa + ca)::BIGINT AS na, max(befb + cb)::BIGINT AS nb
        FROM pref),
terms AS (
  SELECT ca, cb, na, nb,
         2 * (befa + befb) + (ca + cb) + 1 AS r2,
         (2 * (befa + befb) + (ca + cb) + 1 - (2 * befa + ca + 1))::BIGINT AS dxa,
         (2 * (befa + befb) + (ca + cb) + 1 - (2 * befb + cb + 1))::BIGINT AS dxb
  FROM pref, tot
),
sums AS (
  SELECT max(na) AS na, max(nb) AS nb,
         sum(ca::HUGEINT * r2::HUGEINT) AS sra,
         sum(cb::HUGEINT * r2::HUGEINT) AS srb,
         sum(ca::HUGEINT * dxa::HUGEINT) AS ta,
         sum(cb::HUGEINT * dxb::HUGEINT) AS tb
  FROM terms
),
sq AS (
  SELECT sum(terms.ca::HUGEINT
             * (terms.na::HUGEINT * dxa::HUGEINT - ta)
             * (terms.na::HUGEINT * dxa::HUGEINT - ta)) AS qa,
         sum(terms.cb::HUGEINT
             * (terms.nb::HUGEINT * dxb::HUGEINT - tb)
             * (terms.nb::HUGEINT * dxb::HUGEINT - tb)) AS qb
  FROM terms, sums
)
SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b,
       cast(floor(1e6 * (cast(srb AS DOUBLE) / (2.0 * cast(nb AS DOUBLE))
            - (cast(nb AS DOUBLE) + 1.0) / 2.0) / cast(na AS DOUBLE)
            + 0.5) AS BIGINT) AS p_hat_micro,
       cast(floor(1e3 * (cast(na AS DOUBLE) * cast(nb AS DOUBLE)
            * (cast(srb AS DOUBLE) / (2.0 * cast(nb AS DOUBLE))
               - cast(sra AS DOUBLE) / (2.0 * cast(na AS DOUBLE))))
            / ((cast(na AS DOUBLE) + cast(nb AS DOUBLE))
               * sqrt(cast(na AS DOUBLE) * (cast(qa AS DOUBLE)
                        / (4.0 * cast(na AS DOUBLE) * cast(na AS DOUBLE)
                           * (cast(na AS DOUBLE) - 1.0)))
                    + cast(nb AS DOUBLE) * (cast(qb AS DOUBLE)
                        / (4.0 * cast(nb AS DOUBLE) * cast(nb AS DOUBLE)
                           * (cast(nb AS DOUBLE) - 1.0)))))
            + 0.5) AS BIGINT) AS w_milli
FROM sums, sq
"""


# --------------------------------------------------------------------------
# Cliff's delta + Vargha-Delaney A (X7 [EXT])
# --------------------------------------------------------------------------


def q_cliffs_delta_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 nonparametric effect sizes between '{a}' and '{b}' event
    values: Cliff's delta = (#(b>a) - #(b<a)) / (n_a*n_b) and
    Vargha-Delaney A = (#(b>a) + #(b=a)/2) / (n_a*n_b) — the magnitude
    companions to the shipped rank TESTS (a p-value says 'different', an
    effect size says 'by how much'; |delta| >= 0.474 is Cohen-large).
    All three dominance counts are exact integers from one prefix walk
    over pooled centi cells: #(b>a) = sum_j cb_j * cumA_(j-1), ties =
    sum_j ca_j*cb_j. Output one row: n_a, n_b, gt_pairs, lt_pairs,
    tie_pairs, delta_micro, vda_micro."""
    cells = _bm_cells(spark, sf_dir)
    w = Window.orderBy("vc").rowsBetween(Window.unboundedPreceding, 0)
    pref = cells.select(
        "ca",
        "cb",
        (F.sum("ca").over(w) - F.col("ca")).cast("bigint").alias("befa"),
        (F.sum("cb").over(w) - F.col("cb")).cast("bigint").alias("befb"),
    )
    dec = "cast({x} as decimal(38,0))"
    sums = pref.agg(
        F.max(F.expr("befa + ca")).cast("bigint").alias("na"),
        F.max(F.expr("befb + cb")).cast("bigint").alias("nb"),
        F.sum(F.expr(f"{dec.format(x='cb')} * {dec.format(x='befa')}")).alias("gt"),
        F.sum(F.expr(f"{dec.format(x='ca')} * {dec.format(x='befb')}")).alias("lt"),
        F.sum(F.expr(f"{dec.format(x='ca')} * {dec.format(x='cb')}")).alias("tie"),
    )
    return sums.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.col("gt").cast("bigint").alias("gt_pairs"),
        F.col("lt").cast("bigint").alias("lt_pairs"),
        F.col("tie").cast("bigint").alias("tie_pairs"),
        F.expr(
            "cast(floor(1e6 * (cast(gt as double) - cast(lt as double))"
            " / (cast(na as double) * cast(nb as double)) + 0.5) as bigint)"
        ).alias("delta_micro"),
        F.expr(
            "cast(floor(1e6 * (cast(gt as double) + cast(tie as double) / 2.0)"
            " / (cast(na as double) * cast(nb as double)) + 0.5) as bigint)"
        ).alias("vda_micro"),
    )


_ORACLE_CLIFF = f"""
WITH cells AS ({_BM_CELLS_SQL}),
pref AS (
  SELECT ca, cb,
         (sum(ca) OVER (ORDER BY vc) - ca)::BIGINT AS befa,
         (sum(cb) OVER (ORDER BY vc) - cb)::BIGINT AS befb
  FROM cells
),
sums AS (
  SELECT max(befa + ca)::BIGINT AS na, max(befb + cb)::BIGINT AS nb,
         sum(cb::HUGEINT * befa::HUGEINT) AS gt,
         sum(ca::HUGEINT * befb::HUGEINT) AS lt,
         sum(ca::HUGEINT * cb::HUGEINT) AS tie
  FROM pref
)
SELECT na AS n_a, nb AS n_b,
       gt::BIGINT AS gt_pairs, lt::BIGINT AS lt_pairs,
       tie::BIGINT AS tie_pairs,
       cast(floor(1e6 * (cast(gt AS DOUBLE) - cast(lt AS DOUBLE))
            / (cast(na AS DOUBLE) * cast(nb AS DOUBLE)) + 0.5) AS BIGINT)
         AS delta_micro,
       cast(floor(1e6 * (cast(gt AS DOUBLE) + cast(tie AS DOUBLE) / 2.0)
            / (cast(na AS DOUBLE) * cast(nb AS DOUBLE)) + 0.5) AS BIGINT)
         AS vda_micro
FROM sums
"""


# --------------------------------------------------------------------------
# SMOG grade per source (X6 [EXT])
# --------------------------------------------------------------------------


def q_smog_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6 SMOG grade per source: 1.0430 * sqrt(polysyllables *
    30/sentences) + 3.1291 — the readability member built ONLY from
    polysyllable density (it ignores word counts entirely, so it
    cross-checks fog/ARI from a third angle). Polysyllable = >= 3 vowel
    groups (the fog convention); counts are exact bigints per source and
    the sqrt lands on an exact integer ratio. Output per source: source,
    n_docs, n_polysyllables, n_sentences, smog_milli."""
    d = _t(spark, sf_dir, "documents")
    per_doc = d.select(
        "source",
        F.expr("greatest(1, size(regexp_extract_all(text, '[.!?]+', 0)))").alias("s"),
        F.expr(
            "size(filter(split(lower(text), '\\\\s+'),"
            " t -> size(regexp_extract_all(t, '[aeiouy]+', 0)) >= 3))"
        ).alias("poly"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("poly").cast("bigint").alias("n_polysyllables"),
            F.sum("s").cast("bigint").alias("n_sentences"),
        )
        .select(
            "source",
            "n_docs",
            "n_polysyllables",
            "n_sentences",
            F.expr(
                "cast(floor(1e3 * (1.0430 * sqrt(cast(n_polysyllables as double)"
                " * 30.0 / cast(n_sentences as double)) + 3.1291) + 0.5) as bigint)"
            ).alias("smog_milli"),
        )
    )


_ORACLE_SMOG = r"""
WITH per_doc AS (
  SELECT source,
         greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS s,
         len(list_filter(regexp_split_to_array(lower(text), '\s+'),
             t -> len(regexp_extract_all(t, '[aeiouy]+')) >= 3)) AS poly
  FROM documents
)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(poly)::BIGINT AS n_polysyllables,
       sum(s)::BIGINT AS n_sentences,
       cast(floor(1e3 * (1.0430 * sqrt(cast(sum(poly) AS DOUBLE)
            * 30.0 / cast(sum(s) AS DOUBLE)) + 3.1291) + 0.5) AS BIGINT)
         AS smog_milli
FROM per_doc GROUP BY source
"""


# --------------------------------------------------------------------------
# Hapax / Sichel / Honore vocabulary profile per language (X6 [EXT])
# --------------------------------------------------------------------------


def q_hapax_sichel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6 frequency-spectrum vocabulary profile per language: hapax
    ratio V1/V (once-words), Sichel's S = V2/V (twice-words — famously
    stable across text sizes), and Honore's R = 100*ln(N)/(1 - V1/V) —
    the richness trio a curation pipeline reads next to Yule's K (wave
    119) and the shipped Chao1/Heaps fits. Tokens are lowered whitespace
    tokens; the spectrum reduces per lang as exact bigints. ln(N) snaps
    to a micro integer IMMEDIATELY (engine libm differ in the last ulp)
    before the Honore divide. Output per lang: lang, n_tokens, n_types,
    v1, v2, hapax_milli, sichel_milli, honore_milli."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        F.explode(
            F.expr("filter(split(lower(text), '\\\\s+'), t -> t <> '')")
        ).alias("tok"),
    )
    per_type = toks.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return (
        per_type.groupBy("lang")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum((F.col("c") == 1).cast("bigint")).cast("bigint").alias("v1"),
            F.sum((F.col("c") == 2).cast("bigint")).cast("bigint").alias("v2"),
        )
        .select(
            "lang",
            "n_tokens",
            "n_types",
            "v1",
            "v2",
            F.expr(
                "cast(floor(1e3 * cast(v1 as double) / cast(n_types as double)"
                " + 0.5) as bigint)"
            ).alias("hapax_milli"),
            F.expr(
                "cast(floor(1e3 * cast(v2 as double) / cast(n_types as double)"
                " + 0.5) as bigint)"
            ).alias("sichel_milli"),
            # ln(N) snapped to micro FIRST; Honore's R from the snapped int
            F.expr(
                "cast(floor(1e3 * 100.0"
                " * (cast(cast(floor(1e6 * ln(cast(n_tokens as double)) + 0.5)"
                "          as bigint) as double) / 1e6)"
                " / (1.0 - cast(v1 as double) / cast(n_types as double))"
                " + 0.5) as bigint)"
            ).alias("honore_milli"),
        )
    )


_ORACLE_HAPAX = r"""
WITH toks AS (
  SELECT lang, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                  t -> t <> '')) AS tok
  FROM documents
),
per_type AS (
  SELECT lang, tok, count(*)::BIGINT AS c FROM toks GROUP BY lang, tok
),
spec AS (
  SELECT lang, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
         sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS v1,
         sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT AS v2
  FROM per_type GROUP BY lang
)
SELECT lang, n_tokens, n_types, v1, v2,
       cast(floor(1e3 * cast(v1 AS DOUBLE) / cast(n_types AS DOUBLE)
            + 0.5) AS BIGINT) AS hapax_milli,
       cast(floor(1e3 * cast(v2 AS DOUBLE) / cast(n_types AS DOUBLE)
            + 0.5) AS BIGINT) AS sichel_milli,
       cast(floor(1e3 * 100.0
            * (cast(cast(floor(1e6 * ln(cast(n_tokens AS DOUBLE)) + 0.5)
                     AS BIGINT) AS DOUBLE) / 1e6)
            / (1.0 - cast(v1 AS DOUBLE) / cast(n_types AS DOUBLE))
            + 0.5) AS BIGINT) AS honore_milli
FROM spec
"""


REGISTRY_EXT120: dict[str, QuerySpec] = {
    "brunner_munzel_test": QuerySpec(
        q_brunner_munzel_test, _ORACLE_BM, "X7 [EXT] Brunner-Munzel test"
    ),
    "cliffs_delta_effect": QuerySpec(
        q_cliffs_delta_effect, _ORACLE_CLIFF, "X7 [EXT] Cliff's delta / VDA"
    ),
    "smog_index": QuerySpec(q_smog_index, _ORACLE_SMOG, "X6 [EXT] SMOG grade"),
    "hapax_sichel_stats": QuerySpec(
        q_hapax_sichel_stats, _ORACLE_HAPAX, "X6 [EXT] hapax/Sichel/Honore"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_brunner_munzel_test.__doc__ = q_brunner_munzel_test.__doc__.format(a=_BM_A, b=_BM_B)  # noqa: E501
q_cliffs_delta_effect.__doc__ = q_cliffs_delta_effect.__doc__.format(a=_BM_A, b=_BM_B)  # noqa: E501
