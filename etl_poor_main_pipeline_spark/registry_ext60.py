"""Operator registry, wave 61: deterministic training-batch assignment,
stemming equivalence classes, and a 2-D equi-depth dependence grid.

Scale stances:
- Batch assignment: THE global-shuffle problem of training-data prep —
  a reproducible random permutation of the corpus, cut into fixed-size
  batches. The permutation is the md5 hash order (no RNG state) and
  the global position is the Blelloch rank
  (operators/scan_prefix.global_rank_zero) — range partitions +
  partitioned scans, no single-partition stage, identical output on
  any cluster layout.
- Stemming classes: a CASE-rule suffix stripper (pure expression,
  identical SQL in both engines) folds token variants into
  equivalence classes — the vocabulary-collapse step before counting;
  frames are vocabulary-bounded.
- Equi-depth grid: decile ranks on BOTH dimensions via two Blelloch
  ranks joined on the key — the copula view of dependence (uniform
  cells = independent; diagonal mass = correlated) that equi-width
  2-D histograms (heatmap_bin_2d) cannot give on skewed data.

Reference parity: none; [EXT] X6/X7/X8 tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.text import tokens_expr
from .operators.scan_prefix import global_rank_zero
from .registry import QuerySpec, _t

# --------------------------------------------------------------------------
# Deterministic training-batch assignment (X8 [EXT])
# --------------------------------------------------------------------------

_BATCH_SIZE = 256


def q_training_batch_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X8 reproducible global shuffle + batching: documents are
    permuted by md5(doc_id) (stateless, seedless, identical on every
    run and cluster layout) and cut into training batches of {b}; the
    global position is the Blelloch two-phase rank — no
    single-partition sort anywhere. Reports per batch: docs, total
    chars (the token-budget proxy), and the doc-id checksum that
    pins membership, so a re-run anywhere must reproduce every batch
    bit-for-bit."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", F.md5(F.col("doc_id").cast("string")).alias("hk")
    )
    n_parts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    ranked = global_rank_zero(d, ["hk", "doc_id"], n_parts, out="r0")
    return (
        ranked.withColumn(
            "batch", (F.col("r0") / F.lit(_BATCH_SIZE)).cast("bigint")
        )
        .groupBy("batch")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.expr("bit_xor(doc_id)").cast("bigint").alias("member_xor"),
        )
        .orderBy("batch")
    )


_ORACLE_BATCH = f"""
WITH ranked AS (
  SELECT doc_id, n_chars,
         row_number() OVER (ORDER BY md5(cast(doc_id AS varchar)), doc_id) - 1
           AS r0
  FROM documents
)
SELECT cast(r0 // {_BATCH_SIZE} AS bigint) AS batch,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS sum_chars,
       cast(bit_xor(doc_id) AS bigint) AS member_xor
FROM ranked GROUP BY 1 ORDER BY batch
"""


# --------------------------------------------------------------------------
# Stemming equivalence classes (X6 [EXT])
# --------------------------------------------------------------------------

_STEM_TOPK = 30

# identical CASE text runs in Spark SQL and DuckDB: a minimal
# suffix-stripper (ing/ed/es/s with length guards), applied once.
_STEM_CASE = (
    "CASE WHEN length({t}) > 5 AND {t} LIKE '%ing'"
    " THEN substring({t}, 1, length({t}) - 3) "
    "WHEN length({t}) > 4 AND {t} LIKE '%ed'"
    " THEN substring({t}, 1, length({t}) - 2) "
    "WHEN length({t}) > 4 AND {t} LIKE '%es'"
    " THEN substring({t}, 1, length({t}) - 2) "
    "WHEN length({t}) > 3 AND {t} LIKE '%s'"
    " THEN substring({t}, 1, length({t}) - 1) "
    "ELSE {t} END"
)


def q_stem_equivalence_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6 suffix-stripper equivalence classes: tokens fold into
    stems via an ordered CASE rule chain (ing/ed/es/s with length
    guards — the light-stemming vocabulary collapse run before
    frequency cutoffs); reports the top-{k} stems by collapsed
    frequency with their variant counts. The CASE text is identical
    in both engines; all frames are vocabulary-bounded."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens_expr("text")).alias("t"))
    stemmed = toks.selectExpr("t", _STEM_CASE.format(t="t") + " as stem")
    classes = stemmed.groupBy("stem").agg(
        F.countDistinct("t").cast("bigint").alias("n_variants"),
        F.count(F.lit(1)).cast("bigint").alias("freq"),
    )
    return classes.orderBy(F.desc("freq"), F.asc("stem")).limit(_STEM_TOPK)


_ORACLE_STEM = rf"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            t -> t <> '')) AS t
  FROM documents
),
stemmed AS (
  SELECT t, {_STEM_CASE.format(t="t")} AS stem FROM toks
)
SELECT stem, count(DISTINCT t)::BIGINT AS n_variants, count(*)::BIGINT AS freq
FROM stemmed GROUP BY stem
ORDER BY freq DESC, stem ASC
LIMIT {_STEM_TOPK}
"""


# --------------------------------------------------------------------------
# 2-D equi-depth dependence grid (X7 [EXT])
# --------------------------------------------------------------------------

_GRID_D = 10


def q_equi_depth_grid_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 2-D equi-depth grid (the copula view): orders rank
    independently on o_totalprice and o_custkey (Blelloch global
    ranks, no single-partition window), each rank folds to a decile,
    and the {d}x{d} cell counts expose dependence — independent
    dimensions give ~uniform cells, correlation stacks the diagonal.
    The equi-WIDTH 2-D histogram (heatmap_bin_2d) cannot show this on
    skewed marginals; equi-depth is exactly the skew-proof
    normalization."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("bigint")
        .alias("price_c"),
        "o_custkey",
    )
    n_parts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    n_tot = o.agg(F.count(F.lit(1)).alias("n"))
    rp = global_rank_zero(o, ["price_c", "o_orderkey"], n_parts, out="rp").select(
        "o_orderkey", "rp"
    )
    rc = global_rank_zero(
        o.select("o_orderkey", "o_custkey"), ["o_custkey", "o_orderkey"], n_parts, out="rc"
    ).select("o_orderkey", "rc")
    return (
        rp.join(rc, "o_orderkey")
        .crossJoin(F.broadcast(n_tot))
        .select(
            F.floor(F.col("rp") * _GRID_D / F.col("n")).cast("bigint").alias("price_dec"),
            F.floor(F.col("rc") * _GRID_D / F.col("n")).cast("bigint").alias("cust_dec"),
        )
        .groupBy("price_dec", "cust_dec")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .orderBy("price_dec", "cust_dec")
    )


_ORACLE_GRID = f"""
WITH o AS (
  SELECT o_orderkey,
         cast(floor(o_totalprice * 100.0 + 0.5) AS bigint) AS price_c,
         o_custkey
  FROM orders
),
n_tot AS (SELECT count(*)::BIGINT AS n FROM o),
rp AS (
  SELECT o_orderkey,
         row_number() OVER (ORDER BY price_c, o_orderkey) - 1 AS rp
  FROM o
),
rc AS (
  SELECT o_orderkey,
         row_number() OVER (ORDER BY o_custkey, o_orderkey) - 1 AS rc
  FROM o
)
SELECT cast(floor(rp.rp * {_GRID_D} * 1.0 / t.n) AS bigint) AS price_dec,
       cast(floor(rc.rc * {_GRID_D} * 1.0 / t.n) AS bigint) AS cust_dec,
       count(*)::BIGINT AS n_orders
FROM rp JOIN rc USING (o_orderkey) CROSS JOIN n_tot t
GROUP BY 1, 2 ORDER BY price_dec, cust_dec
"""


REGISTRY_EXT60: dict[str, QuerySpec] = {
    "training_batch_assignment": QuerySpec(
        q_training_batch_assignment, _ORACLE_BATCH, "X8 [EXT] reproducible shuffle"
    ),
    "stem_equivalence_classes": QuerySpec(
        q_stem_equivalence_classes, _ORACLE_STEM, "X6 [EXT] vocabulary collapse"
    ),
    "equi_depth_grid_2d": QuerySpec(
        q_equi_depth_grid_2d, _ORACLE_GRID, "X7 [EXT] copula dependence grid"
    ),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_training_batch_assignment.__doc__ = q_training_batch_assignment.__doc__.format(b=_BATCH_SIZE)  # noqa: E501
q_stem_equivalence_classes.__doc__ = q_stem_equivalence_classes.__doc__.format(k=_STEM_TOPK)  # noqa: E501
q_equi_depth_grid_2d.__doc__ = q_equi_depth_grid_2d.__doc__.format(d=_GRID_D)  # noqa: E501
