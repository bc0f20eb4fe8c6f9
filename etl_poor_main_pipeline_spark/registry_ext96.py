"""Operator registry, wave 97: graph link prediction, mergeable-sketch set
algebra, inter-annotator agreement, and t-closeness — four audit/selection
operators a large-scale corpus pipeline runs beside dedup and privacy.

Scale stances:
- adamic_adar_linkpred: bipartite doc->trigram with a document-frequency
  cap (2 <= df <= _AA_DF_CAP) BEFORE the equi self-join on the trigram —
  fan-out is bounded by C(cap, 2) pairs per trigram (the winnowing /
  MinHash stop-key skew cap), never all-pairs; final cut is a
  TakeOrderedAndProject. The 1/ln(df) and 1/df weights come from a
  Python-precomputed 19-entry CASE literal table shared verbatim with the
  oracle, so NO transcendental is evaluated in either engine (libm
  last-ulp divergence can't exist, rather than "probably doesn't").
- kmv_set_ops: the KMV sketches are O(k) per group; union-merge is
  "union + re-rank + keep k smallest" — the textbook mergeable-sketch
  algebra. Every frame after the sketch reduce is (groups x k)-bounded;
  the event-type pair grid is an enum-bounded cross join.
- krippendorff_alpha_nominal: the within-unit rater pair join fans out at
  most coders^2 per unit (coder domain is a fixed modulus); disagreement
  mass is EXACT integer arithmetic — 1/(m_u - 1) terms are scaled by
  lcm(1..6) = 60 so every contribution is a whole number, and alpha folds
  to double in ONE final division (IEEE-correctly-rounded, identical in
  both engines).
- t_closeness_emd: 1-D earth-mover's distance over a fixed ordered bin
  domain via prefix sums on the (group x bin) grid — grouped counts plus a
  bins-bounded window; the |cumP - cumQ| terms are brought to the common
  denominator N * n_g so the EMD numerator is an exact bigint.

Reference parity: none; [EXT] X7/X9 tier per BASELINE.json.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators.dedup import POLY_P, minhash_coeffs
from .registry import QuerySpec, _t

_TOK = r"filter(split(lower(text), '\\s+'), t -> t <> '')"
_DUCK_TOK = r"list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')"


# --------------------------------------------------------------------------
# Adamic-Adar / resource-allocation link prediction (X9 [EXT])
# --------------------------------------------------------------------------

_AA_DF_CAP = 20
_AA_TOPK = 30
# Python-precomputed micro weights: NO ln()/division is evaluated in either
# engine — both get the identical literal CASE table over df in [2, cap]
_AA_TERMS = {d: math.floor(1e6 / math.log(d) + 0.5) for d in range(2, _AA_DF_CAP + 1)}
_RA_TERMS = {d: math.floor(1e6 / d + 0.5) for d in range(2, _AA_DF_CAP + 1)}


def _case_table(terms: dict[int, int], col: str) -> str:
    whens = " ".join(f"WHEN {d} THEN {v}" for d, v in terms.items())
    return f"CASE {col} {whens} END"


def q_adamic_adar_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X9 link prediction over the bipartite document->trigram
    graph: for every candidate document pair sharing at least one RARE
    trigram (2 <= df <= {cap}), score the predicted link with the three
    classic feature-weighted indices — common neighbors (cn),
    Adamic-Adar (sum 1/ln df, micro-int) and resource allocation
    (sum 1/df, micro-int) — and keep the top {k} pairs. AA/RA weight
    shared-but-rare features above shared-but-common ones, which is how
    near-dup *candidate promotion* ranks pairs the LSH bands missed.
    The df cap is the skew bound: a trigram can fan out at most
    C({cap},2) pairs, so the equi self-join on the trigram is blocked,
    never all-pairs."""
    from .operators.dedup import spread

    d = _t(spark, sf_dir, "documents")
    toks = spread(d.select("doc_id", F.expr(_TOK).alias("ts")).where(F.size("ts") >= 3))
    dt = (
        toks.select(
            "doc_id",
            F.expr(
                "explode(transform(sequence(1, size(ts) - 2),"
                " i -> concat_ws(' ', element_at(ts, i), element_at(ts, i + 1),"
                " element_at(ts, i + 2))))"
            ).alias("t"),
        )
        .distinct()
        # the tokenize+explode+distinct pipeline feeds df_t AND both self-join
        # sides — materialize it once (lazy: building the frame costs no job)
        .localCheckpoint(eager=False)
    )
    df_t = (
        dt.groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= _AA_DF_CAP))
        .select(
            "t",
            F.expr(_case_table(_AA_TERMS, "df")).cast("bigint").alias("aa_w"),
            F.expr(_case_table(_RA_TERMS, "df")).cast("bigint").alias("ra_w"),
        )
    )
    rare = dt.join(df_t, "t").localCheckpoint(eager=False)
    pairs = (
        rare.alias("a")
        .join(
            rare.alias("b"),
            (F.col("a.t") == F.col("b.t")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cn"),
            F.sum(F.col("a.aa_w")).cast("bigint").alias("aa_micro"),
            F.sum(F.col("a.ra_w")).cast("bigint").alias("ra_micro"),
        )
    )
    return pairs.orderBy(
        F.desc("aa_micro"), F.asc("id_a"), F.asc("id_b")
    ).limit(_AA_TOPK)


_ORACLE_AA = f"""
WITH dt AS (
  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS t
  FROM (SELECT doc_id, {_DUCK_TOK} AS ts FROM documents),
       (SELECT unnest(generate_series(
          1, (SELECT coalesce(max(len({_DUCK_TOK})), 3) FROM documents) - 2)) AS i) r
  WHERE len(ts) >= 3 AND i <= len(ts) - 2
),
df_t AS (
  SELECT t, {_case_table(_AA_TERMS, "cast(count(*) AS bigint)")}::BIGINT AS aa_w,
         {_case_table(_RA_TERMS, "cast(count(*) AS bigint)")}::BIGINT AS ra_w
  FROM dt GROUP BY t
  HAVING count(*) BETWEEN 2 AND {_AA_DF_CAP}
),
rare AS (SELECT dt.doc_id, dt.t, df_t.aa_w, df_t.ra_w FROM dt JOIN df_t USING (t)),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         cast(count(*) AS bigint) AS cn,
         sum(a.aa_w)::BIGINT AS aa_micro,
         sum(a.ra_w)::BIGINT AS ra_micro
  FROM rare a JOIN rare b ON a.t = b.t AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, cn, aa_micro, ra_micro
FROM pairs
ORDER BY aa_micro DESC, id_a, id_b
LIMIT {_AA_TOPK}
"""


# --------------------------------------------------------------------------
# KMV sketch set algebra: union / intersection / Jaccard (sketch [EXT])
# --------------------------------------------------------------------------

_KSO_K = 64
(_KSO_A, _KSO_B) = minhash_coeffs(1, seed=31)[0]


def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] sketch: SET ALGEBRA on KMV sketches — for every event-type
    pair, estimate |A|, |B|, |A u B| and |A n B| over distinct user
    sets from O(k) sketch state only. Union-merge is the mergeable-
    sketch operation itself: union the two k-sets, keep the k smallest,
    read the k-th value; intersection comes by inclusion-exclusion and
    the Jaccard estimate is the fraction of the merged k-set present in
    both sides. When a side has fewer than k distinct hashes the sketch
    IS the set and the estimates are exact — so the same query is an
    exact-at-small-SF / approximate-at-scale contract. Portable
    universal hash (a*u+b mod p, fixed seed) makes every estimated
    VALUE, not just an error bound, reproducible by the oracle."""
    e = _t(spark, sf_dir, "events")
    hs = e.select(
        "event_type",
        F.expr(f"(({_KSO_A} * user_id + {_KSO_B}) % {POLY_P})").alias("h"),
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    # the k-bounded sketch frame feeds est, both pair-grid sides, and the
    # merged ranking — materialize once (lazy)
    sk = (
        hs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _KSO_K)
        .localCheckpoint(eager=False)
    )
    est = (
        sk.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_h"),
            F.max(F.when(F.col("rn") == _KSO_K, F.col("h"))).alias("hk"),
        )
        .select(
            "event_type",
            F.when(F.col("n_h") < _KSO_K, F.col("n_h"))
            .otherwise(
                F.floor(
                    F.lit(float((_KSO_K - 1) * POLY_P)) / F.col("hk").cast("double")
                )
            )
            .cast("bigint")
            .alias("est"),
        )
    )
    tp = (
        est.select(F.col("event_type").alias("ta"), F.col("est").alias("est_a"))
        .join(
            est.select(F.col("event_type").alias("tb"), F.col("est").alias("est_b")),
            F.col("ta") < F.col("tb"),
        )
    )
    ska = tp.select("ta", "tb").join(
        sk.select(F.col("event_type").alias("ta"), "h"), "ta"
    ).select("ta", "tb", "h", F.lit(1).alias("ina"), F.lit(0).alias("inb"))
    skb = tp.select("ta", "tb").join(
        sk.select(F.col("event_type").alias("tb"), "h"), "tb"
    ).select("ta", "tb", "h", F.lit(0).alias("ina"), F.lit(1).alias("inb"))
    mg = (
        ska.unionByName(skb)
        .groupBy("ta", "tb", "h")
        .agg(F.max("ina").alias("ina"), F.max("inb").alias("inb"))
    )
    wm = Window.partitionBy("ta", "tb").orderBy("h")
    mgr = mg.withColumn("rn", F.row_number().over(wm)).where(F.col("rn") <= _KSO_K)
    msum = mgr.groupBy("ta", "tb").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hu"),
        F.max(F.when(F.col("rn") == _KSO_K, F.col("h"))).alias("hku"),
        F.sum(F.when((F.col("ina") == 1) & (F.col("inb") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("matches"),
    )
    out = (
        msum.join(tp, ["ta", "tb"])
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            "est_a",
            "est_b",
            F.when(F.col("n_hu") < _KSO_K, F.col("n_hu"))
            .otherwise(
                F.floor(
                    F.lit(float((_KSO_K - 1) * POLY_P)) / F.col("hku").cast("double")
                )
            )
            .cast("bigint")
            .alias("est_union"),
            "matches",
            "n_hu",
        )
        .select(
            "type_a",
            "type_b",
            "est_a",
            "est_b",
            "est_union",
            F.greatest(
                F.lit(0).cast("bigint"),
                (F.col("est_a") + F.col("est_b") - F.col("est_union")).cast("bigint"),
            ).alias("est_intersect"),
            F.floor(
                F.lit(1e6) * F.col("matches").cast("double")
                / F.col("n_hu").cast("double")
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("jaccard_micro"),
        )
    )
    return out.orderBy("type_a", "type_b")


_ORACLE_KSO = f"""
WITH hs AS (
  SELECT DISTINCT event_type, ({_KSO_A} * user_id + {_KSO_B}) % {POLY_P} AS h
  FROM events
),
sk AS (
  SELECT * FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM hs
  ) WHERE rn <= {_KSO_K}
),
est AS (
  SELECT event_type,
         cast(CASE WHEN count(*) < {_KSO_K} THEN count(*)
              ELSE floor({float((_KSO_K - 1) * POLY_P)!r}
                         / cast(max(CASE WHEN rn = {_KSO_K} THEN h END) AS double))
              END AS bigint) AS est
  FROM sk GROUP BY event_type
),
tp AS (
  SELECT a.event_type AS ta, b.event_type AS tb, a.est AS est_a, b.est AS est_b
  FROM est a JOIN est b ON a.event_type < b.event_type
),
mg AS (
  SELECT ta, tb, h, max(ina) AS ina, max(inb) AS inb
  FROM (
    SELECT tp.ta, tp.tb, sk.h, 1 AS ina, 0 AS inb
    FROM tp JOIN sk ON sk.event_type = tp.ta
    UNION ALL
    SELECT tp.ta, tp.tb, sk.h, 0 AS ina, 1 AS inb
    FROM tp JOIN sk ON sk.event_type = tp.tb
  ) GROUP BY 1, 2, 3
),
mgr AS (
  SELECT * FROM (
    SELECT ta, tb, h, ina, inb,
           row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
    FROM mg
  ) WHERE rn <= {_KSO_K}
),
msum AS (
  SELECT ta, tb,
         cast(count(*) AS bigint) AS n_hu,
         max(CASE WHEN rn = {_KSO_K} THEN h END) AS hku,
         cast(sum(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END) AS bigint)
           AS matches
  FROM mgr GROUP BY 1, 2
)
SELECT tp.ta AS type_a, tp.tb AS type_b, tp.est_a, tp.est_b,
       cast(CASE WHEN m.n_hu < {_KSO_K} THEN m.n_hu
            ELSE floor({float((_KSO_K - 1) * POLY_P)!r} / cast(m.hku AS double))
            END AS bigint) AS est_union,
       greatest(0::BIGINT,
         tp.est_a + tp.est_b
         - cast(CASE WHEN m.n_hu < {_KSO_K} THEN m.n_hu
                ELSE floor({float((_KSO_K - 1) * POLY_P)!r} / cast(m.hku AS double))
                END AS bigint))::BIGINT AS est_intersect,
       cast(floor(1e6 * cast(m.matches AS double) / cast(m.n_hu AS double) + 0.5)
            AS bigint) AS jaccard_micro
FROM msum m JOIN tp ON m.ta = tp.ta AND m.tb = tp.tb
ORDER BY type_a, type_b
"""


# --------------------------------------------------------------------------
# Krippendorff's alpha, nominal data (X7 [EXT])
# --------------------------------------------------------------------------

_KA_CODERS = 7  # fixed coder modulus -> bounded per-unit pair fan-out
_KA_LCM = 60  # lcm(1..6): makes every 1/(m_u - 1) term a whole number


def q_krippendorff_alpha_nominal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Krippendorff's alpha (nominal) — the inter-annotator
    agreement coefficient that, unlike Cohen's kappa, handles any number
    of raters AND missing ratings: exactly the labeling-QA shape of a
    crowd-annotated training corpus. Units = event days, coders =
    user_id mod {c} (a fixed modulus), a coder's rating on a unit = the
    lexicographically-first event_type they emitted that day (a
    deterministic synthetic annotation task). Observed disagreement
    weights each disagreeing ordered rater pair by 1/(m_u - 1); terms
    are scaled by lcm(1..6) = {l} so the disagreement mass S is an EXACT
    bigint (m_u <= {c}); expected disagreement comes from the integer
    coincidence marginals, and alpha = 1 - S*(n-1)/({l}*E) folds to
    double in ONE final correctly-rounded division."""
    e = _t(spark, sf_dir, "events")
    # a coder's rating on a unit = event_type of their FIRST event that day
    # ((ts, event_id) is a total order) — varies across units, unlike a
    # min-over-types rating which collapses to the alphabetic minimum
    # whenever a coder has several events that day
    wr = Window.partitionBy("u", "c").orderBy("ts", "event_id")
    r = (
        e.select(
            F.expr("unix_micros(ts) div 86400000000").alias("u"),
            F.pmod(F.col("user_id"), F.lit(_KA_CODERS)).alias("c"),
            "ts",
            "event_id",
            "event_type",
        )
        .withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select("u", "c", F.col("event_type").alias("v"))
    )
    mu = r.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    rm = r.join(mu.where(F.col("m") >= 2), "u")
    # ordered rater pairs within a unit: fan-out <= coders^2, domain-bounded
    s = (
        rm.alias("a")
        .join(
            rm.alias("b"),
            (F.col("a.u") == F.col("b.u")) & (F.col("a.c") != F.col("b.c")),
        )
        .where(F.col("a.v") != F.col("b.v"))
        .agg(
            F.coalesce(
                F.sum((F.lit(_KA_LCM) / (F.col("a.m") - 1)).cast("bigint")), F.lit(0)
            )
            .cast("bigint")
            .alias("s_scaled")
        )
    )
    marg = rm.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("nv"))
    tot = marg.agg(
        F.sum("nv").cast("bigint").alias("n"),
        F.sum(F.col("nv") * F.col("nv")).cast("bigint").alias("sq"),
    )
    n_units = rm.select("u").distinct().count()
    return (
        s.crossJoin(tot)
        .select(
            F.lit(n_units).cast("bigint").alias("n_units"),
            F.col("n").alias("n_ratings"),
            "s_scaled",
            (F.col("n") * F.col("n") - F.col("sq")).cast("bigint").alias("e_pairs"),
        )
        .select(
            "n_units",
            "n_ratings",
            "s_scaled",
            "e_pairs",
            # e_pairs = 0 means every rating is the same value: expected
            # disagreement is zero and alpha degenerates to perfect agreement
            F.when(F.col("e_pairs") == 0, F.lit(1_000_000).cast("bigint"))
            .otherwise(
                F.floor(
                    F.lit(1e6)
                    * (
                        F.lit(1.0)
                        - F.col("s_scaled").cast("double")
                        * (F.col("n_ratings") - 1).cast("double")
                        / (F.lit(float(_KA_LCM)) * F.col("e_pairs").cast("double"))
                    )
                    + F.lit(0.5)
                ).cast("bigint")
            )
            .alias("alpha_micro"),
        )
    )


_ORACLE_KA = f"""
WITH r AS (
  SELECT u, c, event_type AS v FROM (
    SELECT epoch_us(ts) // 86400000000 AS u,
           user_id % {_KA_CODERS} AS c,
           event_type,
           row_number() OVER (PARTITION BY epoch_us(ts) // 86400000000,
                                           user_id % {_KA_CODERS}
                              ORDER BY ts, event_id) AS rn
    FROM events
  ) WHERE rn = 1
),
mu AS (SELECT u, cast(count(*) AS bigint) AS m FROM r GROUP BY 1),
rm AS (SELECT r.u, r.c, r.v, mu.m FROM r JOIN mu USING (u) WHERE mu.m >= 2),
s AS (
  SELECT coalesce(sum(cast({_KA_LCM} // (a.m - 1) AS bigint)), 0)::BIGINT
           AS s_scaled
  FROM rm a JOIN rm b ON a.u = b.u AND a.c <> b.c
  WHERE a.v <> b.v
),
marg AS (SELECT v, cast(count(*) AS bigint) AS nv FROM rm GROUP BY 1),
tot AS (
  SELECT sum(nv)::BIGINT AS n, sum(nv * nv)::BIGINT AS sq FROM marg
),
units AS (SELECT cast(count(DISTINCT u) AS bigint) AS n_units FROM rm)
SELECT units.n_units, tot.n AS n_ratings, s.s_scaled,
       (tot.n * tot.n - tot.sq)::BIGINT AS e_pairs,
       CASE WHEN tot.n * tot.n - tot.sq = 0 THEN 1000000::BIGINT
            ELSE cast(floor(1e6 * (1.0 - cast(s.s_scaled AS double)
                               * cast(tot.n - 1 AS double)
                               / ({float(_KA_LCM)!r} * cast(tot.n * tot.n - tot.sq AS double)))
                  + 0.5) AS bigint) END AS alpha_micro
FROM s, tot, units
"""


# --------------------------------------------------------------------------
# t-closeness via 1-D earth-mover's distance (X7 [EXT])
# --------------------------------------------------------------------------

_TC_BINS = 10
_TC_T_MICRO = 200_000  # t = 0.2


def q_t_closeness_emd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 t-closeness audit — the release-privacy criterion beyond
    k-anonymity/l-diversity: a quasi-identifier group leaks if the
    distribution of the ordered sensitive attribute within the group
    sits further than t from the global distribution under the
    earth-mover's distance. Groups = event_type, sensitive = value
    decile bins (fixed width, ordered). 1-D EMD over B ordered bins =
    (1/(B-1)) * sum over the first B-1 prefixes |cumP - cumQ|; both
    CDFs are brought to the common denominator N * n_g, so the EMD
    numerator is an exact bigint from grouped counts + a bins-bounded
    prefix window, and the only double division is the final micro
    fold. Grid zero-fill makes absent bins explicit in both engines."""
    e = _t(spark, sf_dir, "events")
    binned = e.select(
        "event_type",
        F.least(
            F.lit(_TC_BINS - 1),
            F.greatest(F.lit(0), F.floor(F.col("value") / F.lit(10.0))),
        )
        .cast("bigint")
        .alias("b"),
    )
    cnt = binned.groupBy("event_type", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    groups = cnt.select("event_type").distinct()
    bins = spark.range(_TC_BINS).select(F.col("id").cast("bigint").alias("b"))
    grid = (
        groups.crossJoin(bins)
        .join(cnt, ["event_type", "b"], "left")
        .select("event_type", "b", F.coalesce("c", F.lit(0)).cast("bigint").alias("c"))
    )
    gtot = binned.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g")
    )
    glob = binned.groupBy("b").agg(F.count(F.lit(1)).cast("bigint").alias("gc"))
    n_total = binned.count()
    wb = (
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gridded = (
        grid.join(glob.withColumnRenamed("b", "b2"), F.col("b") == F.col("b2"), "left")
        .select(
            "event_type",
            "b",
            "c",
            F.coalesce("gc", F.lit(0)).cast("bigint").alias("gc"),
        )
    )
    # cum_all runs over the per-group REPLICATED global counts — partitioned
    # by event_type (no unpartitioned window anywhere in the plan)
    cums = gridded.select(
        "event_type",
        "b",
        F.sum("c").over(wb).alias("cum_g"),
        F.sum("gc").over(wb).alias("cum_all"),
    )
    emd = (
        cums.where(F.col("b") < _TC_BINS - 1)
        .join(gtot, "event_type")
        .groupBy("event_type", "n_g")
        .agg(
            F.sum(
                F.abs(
                    F.col("cum_all") * F.col("n_g") - F.col("cum_g") * F.lit(n_total)
                )
            )
            .cast("bigint")
            .alias("emd_num")
        )
    )
    return (
        emd.select(
            "event_type",
            "n_g",
            F.floor(
                F.lit(1e6)
                * F.col("emd_num").cast("double")
                / (
                    F.lit(float(_TC_BINS - 1))
                    * F.lit(float(n_total))
                    * F.col("n_g").cast("double")
                )
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("emd_micro"),
        )
        .select(
            "event_type",
            "n_g",
            "emd_micro",
            (F.col("emd_micro") <= _TC_T_MICRO).alias("meets_t"),
        )
        .orderBy("event_type")
    )


_ORACLE_TC = f"""
WITH binned AS (
  SELECT event_type,
         least({_TC_BINS - 1}, greatest(0, cast(floor(value / 10.0) AS bigint)))
           AS b
  FROM events
),
cnt AS (
  SELECT event_type, b, cast(count(*) AS bigint) AS c
  FROM binned GROUP BY 1, 2
),
grid AS (
  SELECT g.event_type, s.b, coalesce(cnt.c, 0)::BIGINT AS c
  FROM (SELECT DISTINCT event_type FROM cnt) g
  CROSS JOIN (SELECT unnest(range({_TC_BINS})) AS b) s
  LEFT JOIN cnt ON cnt.event_type = g.event_type AND cnt.b = s.b
),
gtot AS (
  SELECT event_type, cast(count(*) AS bigint) AS n_g FROM binned GROUP BY 1
),
gbin AS (SELECT b, cast(count(*) AS bigint) AS gc FROM binned GROUP BY 1),
ntot AS (SELECT cast(count(*) AS bigint) AS n FROM binned),
cums AS (
  SELECT grid.event_type, grid.b,
         sum(grid.c) OVER (PARTITION BY grid.event_type ORDER BY grid.b)::BIGINT
           AS cum_g,
         sum(coalesce(gbin.gc, 0)) OVER (PARTITION BY grid.event_type
                                         ORDER BY grid.b)::BIGINT AS cum_all
  FROM grid LEFT JOIN gbin USING (b)
),
emd AS (
  SELECT c.event_type, gtot.n_g,
         sum(abs(c.cum_all * gtot.n_g - c.cum_g * ntot.n))::BIGINT AS emd_num,
         any_value(ntot.n) AS n
  FROM cums c JOIN gtot USING (event_type) CROSS JOIN ntot
  WHERE c.b < {_TC_BINS - 1}
  GROUP BY 1, 2
)
SELECT event_type, n_g,
       cast(floor(1e6 * cast(emd_num AS double)
                  / ({float(_TC_BINS - 1)!r} * cast(n AS double) * cast(n_g AS double))
                  + 0.5) AS bigint) AS emd_micro,
       cast(floor(1e6 * cast(emd_num AS double)
                  / ({float(_TC_BINS - 1)!r} * cast(n AS double) * cast(n_g AS double))
                  + 0.5) AS bigint) <= {_TC_T_MICRO} AS meets_t
FROM emd ORDER BY event_type
"""


REGISTRY_EXT96: dict[str, QuerySpec] = {
    "adamic_adar_linkpred": QuerySpec(
        q_adamic_adar_linkpred, _ORACLE_AA, "X9 [EXT] feature-weighted link prediction"
    ),
    "kmv_set_ops": QuerySpec(
        q_kmv_set_ops, _ORACLE_KSO, "sketch [EXT] KMV union/intersect/Jaccard"
    ),
    "krippendorff_alpha_nominal": QuerySpec(
        q_krippendorff_alpha_nominal, _ORACLE_KA, "X7 [EXT] inter-annotator agreement"
    ),
    "t_closeness_emd": QuerySpec(
        q_t_closeness_emd, _ORACLE_TC, "X7 [EXT] t-closeness EMD audit"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_adamic_adar_linkpred.__doc__ = q_adamic_adar_linkpred.__doc__.format(cap=_AA_DF_CAP, k=_AA_TOPK)  # noqa: E501
q_krippendorff_alpha_nominal.__doc__ = q_krippendorff_alpha_nominal.__doc__.format(c=_KA_CODERS, l=_KA_LCM)  # noqa: E501
