"""Operator registry, wave 45: distribution-shift statistical tests II —
Kolmogorov-Smirnov, Mann-Whitney U, Spearman rank correlation, and
mutual information.

These complete the drift-monitoring family started by psi_drift_deciles
(PSI), anova_f_between_groups (ANOVA F) and term_drift_chi2 (chi^2):
the nonparametric tests a training-data pipeline runs when it cannot
assume normality — "did this source's value distribution move?".

Scale stances:
- KS / Mann-Whitney operate on BINNED distributions (integer cents), so
  every frame after the first groupBy is value-DOMAIN-bounded, never
  row-bounded: the raw table aggregates map-side into <= ~50k bins and
  the CDF scan runs over bins, not rows. Cumulative sums use partitioned
  windows (KS: per event_type) or the Blelloch prefix helper
  (Mann-Whitney: operators/scan_prefix.exclusive_prefix_sum) — no
  unpartitioned window anywhere.
- Spearman uses the exact permutation formula 1 - 6*sum(d^2)/(n(n^2-1))
  over deterministically tie-broken row_number ranks (partitioned by
  event_type), so the statistic is integer arithmetic until one final
  division — no floating corr aggregation whose partial-merge order
  could diverge across engines.
- Mutual information reduces to a types x buckets cell grid (50 cells);
  each cell's contribution lands on a nano-int before the final sum, so
  the reduction is integer-deterministic.

Reference parity: the reference has no statistics surface at all (the
only aggregation-free SQL lives in analytics__us_weather.py:34-53);
this tier is mandated by the [EXT] north star (SURVEY §2.7 X7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators.scan_prefix import exclusive_prefix_sum
from .registry import QuerySpec, _t

# --------------------------------------------------------------------------
# Kolmogorov-Smirnov two-sample (each event_type vs the rest)
# --------------------------------------------------------------------------


def _binned_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, integer-cent bin) counts of events.value."""
    return (
        _t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
            .cast("bigint")
            .alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_in"))
    )


def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 two-sample Kolmogorov-Smirnov drift test: for each
    event_type, D = max_x |CDF_in(x) - CDF_out(x)| between that type's
    value distribution and everything else's. The max runs over the
    BINNED support (integer cents), so the CDF frame is domain-bounded;
    the comparison is integer-exact — D's numerator
    |cum_in*n_out - cum_out*n_in| never touches a double until the
    final micro-rounded report. Cumulative sums are windows PARTITIONED
    by event_type (5 partitions over a bins-sized frame), not global."""
    b = _binned_counts(spark, sf_dir)
    bins = b.groupBy("bin").agg(F.sum("n_in").cast("bigint").alias("n_all"))
    types = b.groupBy("event_type").agg(F.sum("n_in").cast("bigint").alias("n_t"))
    n_total = b.agg(F.sum("n_in").cast("bigint").alias("n"))

    grid = (
        bins.crossJoin(F.broadcast(types.select("event_type")))
        .join(b, ["event_type", "bin"], "left")
        .select(
            "event_type", "bin", "n_all", F.coalesce("n_in", F.lit(0)).alias("n_in")
        )
    )
    w = Window.partitionBy("event_type").orderBy("bin")
    cum = grid.select(
        "event_type",
        F.sum("n_in").over(w).alias("cum_in"),
        F.sum("n_all").over(w).alias("cum_all"),
    )
    d = (
        cum.join(F.broadcast(types), "event_type")
        .crossJoin(F.broadcast(n_total))
        .select(
            "event_type",
            "n_t",
            (F.col("n") - F.col("n_t")).alias("n_o"),
            F.abs(
                F.col("cum_in") * (F.col("n") - F.col("n_t"))
                - (F.col("cum_all") - F.col("cum_in")) * F.col("n_t")
            ).alias("num"),
        )
        .groupBy("event_type", "n_t", "n_o")
        .agg(F.max("num").alias("d_num"))
    )
    return d.select(
        "event_type",
        F.col("n_t").alias("n_in"),
        F.col("n_o").alias("n_out"),
        F.col("d_num").cast("bigint").alias("d_num"),
        F.floor(
            F.lit(1e6) * F.col("d_num") / (F.col("n_t") * F.col("n_o")) + F.lit(0.5)
        )
        .cast("bigint")
        .alias("ks_micro"),
    ).orderBy("event_type")


_ORACLE_KS = """
WITH b AS (
  SELECT event_type, cast(floor(value * 100.0 + 0.5) AS bigint) AS bin,
         count(*)::BIGINT AS n_in
  FROM events GROUP BY 1, 2
),
bins AS (SELECT bin, sum(n_in)::BIGINT AS n_all FROM b GROUP BY 1),
types AS (SELECT event_type, sum(n_in)::BIGINT AS n_t FROM b GROUP BY 1),
tot AS (SELECT sum(n_in)::BIGINT AS n FROM b),
grid AS (
  SELECT t.event_type, bi.bin, bi.n_all, coalesce(x.n_in, 0) AS n_in
  FROM types t CROSS JOIN bins bi
  LEFT JOIN b x ON x.event_type = t.event_type AND x.bin = bi.bin
),
cum AS (
  SELECT event_type,
         sum(n_in) OVER (PARTITION BY event_type ORDER BY bin) AS cum_in,
         sum(n_all) OVER (PARTITION BY event_type ORDER BY bin) AS cum_all
  FROM grid
),
d AS (
  SELECT c.event_type, t.n_t, (tt.n - t.n_t) AS n_o,
         max(abs(c.cum_in * (tt.n - t.n_t)
                 - (c.cum_all - c.cum_in) * t.n_t))::BIGINT AS d_num
  FROM cum c JOIN types t USING (event_type) CROSS JOIN tot tt
  GROUP BY 1, 2, 3
)
SELECT event_type, n_t AS n_in, n_o AS n_out, d_num,
       cast(floor(1e6 * d_num / (n_t * n_o) + 0.5) AS bigint) AS ks_micro
FROM d ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Mann-Whitney U (rank-sum) per event_type vs rest
# --------------------------------------------------------------------------


def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Mann-Whitney U rank-sum test, each event_type vs the
    rest, with exact MID-RANKS for ties computed from the binned
    combined distribution: midrank(bin) = before(bin) + (c(bin)+1)/2,
    held as 2x-integers so no fraction ever appears. ``before`` — the
    count of all values in strictly smaller bins — is the Blelloch
    exclusive prefix sum over the domain-bounded bins frame
    (operators/scan_prefix.py), not a global window. Reported
    statistic: u2 = 2*U = sum(2*midrank) - n(n+1), integer-exact."""
    b = _binned_counts(spark, sf_dir)
    bins = b.groupBy("bin").agg(F.sum("n_in").cast("bigint").alias("c"))
    ranked = exclusive_prefix_sum(bins, "bin", "c", out="before")
    joined = b.join(ranked, "bin").select(
        "event_type",
        "n_in",
        # 2 * midrank = 2*before + c + 1
        (
            F.col("n_in") * (F.lit(2) * F.col("before") + F.col("c") + F.lit(1))
        ).alias("r2_part"),
    )
    per_type = joined.groupBy("event_type").agg(
        F.sum("n_in").cast("bigint").alias("n"),
        F.sum("r2_part").cast("bigint").alias("r2"),
    )
    n_total = b.agg(F.sum("n_in").cast("bigint").alias("n_all"))
    return (
        per_type.crossJoin(F.broadcast(n_total))
        .select(
            "event_type",
            F.col("n").alias("n_in"),
            (F.col("n_all") - F.col("n")).alias("n_out"),
            (F.col("r2") - F.col("n") * (F.col("n") + F.lit(1)))
            .cast("bigint")
            .alias("u2"),
        )
        .orderBy("event_type")
    )


_ORACLE_MWU = """
WITH b AS (
  SELECT event_type, cast(floor(value * 100.0 + 0.5) AS bigint) AS bin,
         count(*)::BIGINT AS n_in
  FROM events GROUP BY 1, 2
),
bins AS (SELECT bin, sum(n_in)::BIGINT AS c FROM b GROUP BY 1),
ranked AS (
  SELECT bin, c,
         coalesce(sum(c) OVER (ORDER BY bin
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM bins
),
per_type AS (
  SELECT b.event_type, sum(b.n_in)::BIGINT AS n,
         sum(b.n_in * (2 * r.before + r.c + 1))::BIGINT AS r2
  FROM b JOIN ranked r USING (bin) GROUP BY 1
),
tot AS (SELECT sum(n_in)::BIGINT AS n_all FROM b)
SELECT event_type, n AS n_in, (t.n_all - n) AS n_out,
       cast(r2 - n * (n + 1) AS bigint) AS u2
FROM per_type CROSS JOIN tot t ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Spearman rank correlation (value vs time) per event_type
# --------------------------------------------------------------------------


def q_spearman_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 Spearman rank correlation between value and event time,
    per event_type — "is this metric trending?", robust to outliers and
    monotone transforms. Ranks are row_number with a deterministic
    event_id tie-break (so both rank vectors are exact permutations),
    which makes the permutation formula rho = 1 - 6*sum(d^2)/(n(n^2-1))
    EXACT integer arithmetic until the single final division. Both
    rank windows are partitioned by event_type — per-group parallel,
    no global sort; at 100 TB each group sorts independently and the
    d^2 sum is a map-side-combinable aggregate."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("bigint").alias("v"),
        F.unix_micros("ts").alias("t_us"),
        "event_id",
    )
    wv = Window.partitionBy("event_type").orderBy("v", "event_id")
    wt = Window.partitionBy("event_type").orderBy("t_us", "event_id")
    ranked = e.select(
        "event_type",
        F.row_number().over(wv).alias("rv"),
        F.row_number().over(wt).alias("rt"),
    )
    agg = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            ((F.col("rv") - F.col("rt")) * (F.col("rv") - F.col("rt"))).cast("bigint")
        ).alias("sum_d2"),
    )
    return agg.select(
        "event_type",
        "n",
        "sum_d2",
        F.floor(
            F.lit(1e6)
            * (
                F.lit(1.0)
                - F.lit(6.0)
                * F.col("sum_d2")
                / (F.col("n") * (F.col("n") * F.col("n") - F.lit(1)))
            )
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("rho_micro"),
    ).orderBy("event_type")


_ORACLE_SPEARMAN = """
WITH e AS (
  SELECT event_type,
         cast(floor(value * 100.0 + 0.5) AS bigint) AS v,
         epoch_us(ts) AS t_us, event_id
  FROM events
),
ranked AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY event_type ORDER BY v, event_id) AS rv,
         row_number() OVER (PARTITION BY event_type ORDER BY t_us, event_id) AS rt
  FROM e
),
agg AS (
  SELECT event_type, count(*)::BIGINT AS n,
         sum((rv - rt) * (rv - rt))::BIGINT AS sum_d2
  FROM ranked GROUP BY 1
)
SELECT event_type, n, sum_d2,
       cast(floor(1e6 * (1.0 - 6.0 * sum_d2 / (n * (n * n - 1))) + 0.5) AS bigint)
         AS rho_micro
FROM agg ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Mutual information between event_type and value bucket
# --------------------------------------------------------------------------

_MI_BUCKET_W = 50.0
_MI_N_BUCKETS = 10


def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 mutual information (nats) between event_type and a
    fixed-width value bucket — the feature-relevance screen ("does this
    categorical predict that numeric range?"). The raw table reduces
    map-side to a |types| x |buckets| cell grid (<= 50 cells), marginals
    come from two more tiny aggregates, and each cell's p*ln(p/(q*r))
    contribution is floored to a NANO-int before the final sum — an
    integer reduction whose result cannot depend on partition merge
    order. Reports MI plus the marginal entropy H(event_type) on the
    same nano scale (so NMI is one division away)."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.least(
            F.floor(F.col("value") / F.lit(_MI_BUCKET_W)).cast("bigint"),
            F.lit(_MI_N_BUCKETS - 1).cast("bigint"),
        ).alias("bucket"),
    )
    cells = e.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    row_tot = cells.groupBy("event_type").agg(F.sum("c").cast("bigint").alias("r"))
    col_tot = cells.groupBy("bucket").agg(F.sum("c").cast("bigint").alias("cb"))
    n_tot = cells.agg(F.sum("c").cast("bigint").alias("n"))

    terms = (
        cells.join(F.broadcast(row_tot), "event_type")
        .join(F.broadcast(col_tot), "bucket")
        .crossJoin(F.broadcast(n_tot))
        .select(
            F.floor(
                F.lit(1e9)
                * (F.col("c") / F.col("n"))
                * F.log(
                    F.col("c") * F.col("n") / (F.col("r") * F.col("cb"))
                )
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("mi_term_nano"),
            F.lit(1).alias("one"),
        )
    )
    h_terms = row_tot.crossJoin(F.broadcast(n_tot)).select(
        F.floor(
            F.lit(-1e9) * (F.col("r") / F.col("n")) * F.log(F.col("r") / F.col("n"))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("h_term_nano")
    )
    mi = terms.agg(
        F.sum("mi_term_nano").cast("bigint").alias("mi_nano"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
    )
    h = h_terms.agg(F.sum("h_term_nano").cast("bigint").alias("h_type_nano"))
    return mi.crossJoin(h).select("mi_nano", "h_type_nano", "n_cells")


_ORACLE_MI = f"""
WITH e AS (
  SELECT event_type,
         least(cast(floor(value / {_MI_BUCKET_W}) AS bigint),
               {_MI_N_BUCKETS - 1}) AS bucket
  FROM events
),
cells AS (
  SELECT event_type, bucket, count(*)::BIGINT AS c FROM e GROUP BY 1, 2
),
row_tot AS (SELECT event_type, sum(c)::BIGINT AS r FROM cells GROUP BY 1),
col_tot AS (SELECT bucket, sum(c)::BIGINT AS cb FROM cells GROUP BY 1),
tot AS (SELECT sum(c)::BIGINT AS n FROM cells),
terms AS (
  SELECT cast(floor(1e9 * (cells.c * 1.0 / t.n)
              * ln(cells.c * t.n * 1.0 / (rt.r * ct.cb)) + 0.5) AS bigint)
           AS mi_term_nano
  FROM cells
  JOIN row_tot rt USING (event_type)
  JOIN col_tot ct USING (bucket)
  CROSS JOIN tot t
),
h_terms AS (
  SELECT cast(floor(-1e9 * (r * 1.0 / t.n) * ln(r * 1.0 / t.n) + 0.5) AS bigint)
           AS h_term_nano
  FROM row_tot CROSS JOIN tot t
)
SELECT (SELECT sum(mi_term_nano)::BIGINT FROM terms) AS mi_nano,
       (SELECT sum(h_term_nano)::BIGINT FROM h_terms) AS h_type_nano,
       (SELECT count(*)::BIGINT FROM terms) AS n_cells
"""


REGISTRY_EXT44: dict[str, QuerySpec] = {
    "ks_two_sample_drift": QuerySpec(
        q_ks_two_sample, _ORACLE_KS, "X7 [EXT] KS drift test"
    ),
    "mann_whitney_u": QuerySpec(
        q_mann_whitney_u, _ORACLE_MWU, "X7 [EXT] rank-sum test"
    ),
    "spearman_rank_corr": QuerySpec(
        q_spearman_rank_corr, _ORACLE_SPEARMAN, "X7 [EXT] rank correlation"
    ),
    "mutual_information": QuerySpec(
        q_mutual_information, _ORACLE_MI, "X7 [EXT] feature relevance"
    ),
}
