"""Operator registry, wave 36: web-curation and evaluation depth — URL
canonicalization dedup, tokenizer fertility, operational percentile
bands, contrastive embedding margins, and histogram-based weighted
medians.

Scale stances:
- URL canon: pure regexp canonicalization in the scan stage; dup
  resolution is one hash aggregate on the canonical key.
- fertility: the BPE merge chain is constant-folded expressions; one
  bounded per-language aggregate.
- percentile bands: DISC quantiles via partitioned rank windows — the
  day key shards, no interpolation (integer-exact cross-engine).
- contrastive margins: label centroids are a LABELS x DIMS aggregate
  (tiny) collected into arrays and broadcast; each vector scores
  against L centroids in one projection — no vector-vector join.
- weighted median: computed over the per-(group, value) WEIGHT
  HISTOGRAM, not raw rows — the window scans distinct values per
  group, which is what survives a 100x row blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators.dedup import spread
from .registry import QuerySpec, _t
from .registry_ext33 import _BPE_MERGES

# --------------------------------------------------------------------------
# URL canonicalization dedup (X1/X6 [EXT] web curation)
# --------------------------------------------------------------------------


def q_url_canonicalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X1/X6 URL canonicalization — the first dedup key any web
    corpus builds: lowercase, strip `www.`, drop tracking params
    (`utm_*`, `ref`), drop trailing slash, then count collisions per
    canonical URL. The fixture has no URLs, so each doc synthesizes a
    deterministic messy URL from doc_id (mixed case, www, utm/ref
    params) — doc_id mod-arithmetic guarantees real collisions, and
    both engines build the identical input. Output: every canonical URL
    hit by >= 2 raw URLs. Pure regexp chain in the scan stage + one
    aggregate on the canonical key."""
    d = _t(spark, sf_dir, "documents")
    raw = F.expr(
        "concat('https://WWW.Example', cast(doc_id % 7 as string),"
        " '.COM/Path', cast(doc_id % 50 as string),"
        " '/?id=', cast(doc_id % 10 as string),"
        " '&utm_source=feed&utm_campaign=c', cast(doc_id as string),"
        " '&ref=tw')"
    )
    canon = F.lower(raw)
    canon = F.replace(canon, F.lit("://www."), F.lit("://"))
    canon = F.regexp_replace(canon, r"&utm_[a-z]+=[^&]*", "")
    canon = F.regexp_replace(canon, r"&ref=[^&]*", "")
    canon = F.regexp_replace(canon, r"/\?", "?")
    return (
        d.select("doc_id", canon.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_raw_urls"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
        )
        .where(F.col("n_raw_urls") >= 2)
        .orderBy("canonical_url")
    )


_ORACLE_URL_CANON = r"""
WITH raw AS (
  SELECT doc_id,
         'https://WWW.Example' || (doc_id % 7) || '.COM/Path' || (doc_id % 50)
         || '/?id=' || (doc_id % 10)
         || '&utm_source=feed&utm_campaign=c' || doc_id || '&ref=tw' AS u
  FROM documents
),
canon AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               replace(lower(u), '://www.', '://'),
               '&utm_[a-z]+=[^&]*', '', 'g'),
             '&ref=[^&]*', '', 'g'),
           '/\?', '?', 'g') AS canonical_url
  FROM raw
)
SELECT canonical_url,
       count(*)::BIGINT AS n_raw_urls,
       min(doc_id)::BIGINT AS min_doc,
       max(doc_id)::BIGINT AS max_doc
FROM canon GROUP BY canonical_url
HAVING count(*) >= 2
ORDER BY canonical_url
"""


# --------------------------------------------------------------------------
# Tokenizer fertility by language (X6 [EXT])
# --------------------------------------------------------------------------


def q_bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6 tokenizer FERTILITY (symbols emitted per word) per
    language after applying the wave-34 BPE merge table — the standard
    tokenizer-evaluation metric (high fertility = the vocab serves that
    language poorly). Reuses bpe_apply_merges' constant-folded replace
    chain; one bounded per-language aggregate. fertility_ppm =
    1e6 * symbols / words, floored."""
    d = spread(_t(spark, sf_dir, "documents"))
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != F.lit("")
    )
    tok = d.select("lang", F.explode(toks).alias("tok"))
    sym = F.array_join(F.split(F.col("tok"), ""), "|")
    for a, b in _BPE_MERGES:
        sym = F.replace(sym, F.lit(a + "|" + b), F.lit(a + b))
    return (
        tok.select("lang", F.size(F.split(sym, r"\|")).alias("n_sym"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_sym").cast("bigint").alias("n_symbols"),
        )
        .select(
            "lang",
            "n_words",
            "n_symbols",
            F.floor(F.lit(1000000.0) * F.col("n_symbols") / F.col("n_words"))
            .cast("bigint")
            .alias("fertility_ppm"),
        )
        .orderBy("lang")
    )


def _oracle_fertility() -> str:
    expr = "array_to_string(string_split(tok, ''), '|')"
    for a, b in _BPE_MERGES:
        expr = f"replace({expr}, '{a}|{b}', '{a}{b}')"
    return rf"""
WITH tok AS (
  SELECT lang,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            t -> t <> '')) AS tok
  FROM documents
),
syms AS (SELECT lang, len(string_split({expr}, '|')) AS n_sym FROM tok)
SELECT lang,
       count(*)::BIGINT AS n_words,
       sum(n_sym)::BIGINT AS n_symbols,
       cast(floor(1000000.0 * sum(n_sym) / count(*)) AS bigint) AS fertility_ppm
FROM syms GROUP BY lang ORDER BY lang
"""


# --------------------------------------------------------------------------
# Daily percentile bands (X7 [EXT] ops dashboard)
# --------------------------------------------------------------------------

_PB_QS = [(50, "p50"), (95, "p95"), (99, "p99")]


def q_daily_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 the ops-dashboard staple: per-day p50/p95/p99 of event
    value. DISC quantiles (element at rank ceil(q*n), 1-indexed) — no
    interpolation, so with micro-int values both engines agree exactly.
    Computed with PARTITIONED rank windows (the day key shards) + one
    conditional aggregate; at 100 TB each day is an independent task
    chain."""
    e = _t(spark, sf_dir, "events").select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.floor(F.lit(1e6) * F.col("value") + F.lit(0.5))
        .cast("bigint")
        .alias("v_micro"),
        "event_id",
    )
    w = Window.partitionBy("day").orderBy("v_micro", "event_id")
    ranked = e.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("day"))
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_events")]
    for q, name in _PB_QS:
        target = F.ceil(F.lit(q / 100.0) * F.col("n"))
        aggs.append(
            F.min(F.when(F.col("rn") == target, F.col("v_micro"))).alias(name)
        )
    return ranked.groupBy("day").agg(*aggs).orderBy("day")


def _oracle_bands() -> str:
    cols = ", ".join(
        f"min(CASE WHEN rn = ceil({q / 100.0} * n) THEN v_micro END) AS {name}"
        for q, name in _PB_QS
    )
    return f"""
WITH e AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         cast(floor(1000000.0 * value + 0.5) AS bigint) AS v_micro,
         event_id
  FROM events
),
ranked AS (
  SELECT day, v_micro,
         row_number() OVER (PARTITION BY day ORDER BY v_micro, event_id) AS rn,
         count(*) OVER (PARTITION BY day) AS n
  FROM e
)
SELECT day, count(*)::BIGINT AS n_events, {cols}
FROM ranked GROUP BY day ORDER BY day
"""


# --------------------------------------------------------------------------
# Contrastive embedding margins (X3/eval [EXT])
# --------------------------------------------------------------------------


def q_contrastive_margin_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X3 embedding-quality evaluation: per label, how separable
    is the cluster — each vector's cosine to its OWN label centroid vs
    its best cosine to any OTHER centroid; margin <= 0 means the vector
    sits closer to a foreign centroid (a metric-learning violation).
    Centroids are a LABELS x DIMS aggregate (6dp-rounded so both
    engines hold bit-identical centroids) collected to arrays and
    BROADCAST — every vector scores L centroids in one projection, no
    vector-vector join anywhere. Cosines compared in micro ints."""
    e = _t(spark, sf_dir, "embeddings")
    cents = (
        e.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
        )
        .groupBy("label", "dim")
        .agg(F.round(F.avg("x"), 6).alias("cv"))
        .groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "cv"))
            ).alias("pairs")
        )
        .select(
            F.col("label").alias("c_label"),
            F.transform("pairs", lambda p: p.cv).alias("centroid"),
        )
    )
    v = e.select("vec_id", "label", F.col("embedding").cast("array<double>").alias("v"))
    dot = F.aggregate(
        F.zip_with("v", "centroid", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    cos_micro = F.floor(
        F.lit(1e6) * dot / (norm(F.col("v")) * norm(F.col("centroid"))) + F.lit(0.5)
    ).cast("bigint")
    scored = v.crossJoin(F.broadcast(cents)).select(
        "vec_id", "label", "c_label", cos_micro.alias("cm")
    )
    per_vec = scored.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("label") == F.col("c_label"), F.col("cm"))).alias("own"),
        F.max(F.when(F.col("label") != F.col("c_label"), F.col("cm"))).alias("other"),
    )
    return (
        per_vec.select(
            "label", (F.col("own") - F.col("other")).alias("margin")
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum(F.when(F.col("margin") <= 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violations"),
            F.floor(F.avg("margin")).cast("bigint").alias("avg_margin_micro"),
        )
        .orderBy("label")
    )


_ORACLE_CONTRASTIVE = """
WITH cd AS (
  SELECT label, i - 1 AS dim, round(avg(embedding[i]::DOUBLE), 6) AS cv
  FROM embeddings, range(1, 100) t(i)
  WHERE i <= len(embedding)
  GROUP BY label, i
),
cents AS (
  SELECT label AS c_label, list(cv ORDER BY dim) AS centroid
  FROM cd GROUP BY label
),
scored AS (
  SELECT e.vec_id, e.label, c.c_label,
         cast(floor(1000000.0 *
                list_cosine_similarity(e.embedding::DOUBLE[], c.centroid)
                + 0.5) AS bigint) AS cm
  FROM embeddings e CROSS JOIN cents c
),
per_vec AS (
  SELECT vec_id, label,
         max(CASE WHEN label = c_label THEN cm END) AS own,
         max(CASE WHEN label <> c_label THEN cm END) AS other
  FROM scored GROUP BY vec_id, label
)
SELECT label,
       count(*)::BIGINT AS n_vecs,
       sum(CASE WHEN own - other <= 0 THEN 1 ELSE 0 END)::BIGINT AS n_violations,
       cast(floor(avg(own - other)) AS bigint) AS avg_margin_micro
FROM per_vec GROUP BY label ORDER BY label
"""


# --------------------------------------------------------------------------
# Histogram-based grouped weighted median (X7 [EXT])
# --------------------------------------------------------------------------


def q_grouped_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X7 weighted median of l_extendedprice (weight l_quantity)
    per return flag — computed over the per-(group, value) WEIGHT
    HISTOGRAM: aggregate weights by (flag, cents) FIRST (map-side
    combined), then a partitioned cumulative-weight window over the
    compressed distribution picks the smallest value whose cumulative
    weight reaches ceil(W/2). The window scans distinct values per
    group, not raw rows — 100x more rows, same window size. All
    integer; DISC convention; zero FP."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.lit(100.0) * F.col("l_extendedprice") + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    hist = li.groupBy("l_returnflag", "cents").agg(F.sum("w").alias("wsum"))
    wname = Window.partitionBy("l_returnflag").orderBy("cents")
    cum = hist.withColumn("cw", F.sum("wsum").over(wname)).withColumn(
        "wtot", F.sum("wsum").over(Window.partitionBy("l_returnflag"))
    )
    half = F.ceil(F.col("wtot") / F.lit(2))
    return (
        cum.where(F.col("cw") >= half)
        .groupBy("l_returnflag")
        .agg(
            F.min("cents").cast("bigint").alias("wmedian_cents"),
            F.max("wtot").cast("bigint").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


_ORACLE_WMEDIAN = """
WITH hist AS (
  SELECT l_returnflag,
         cast(floor(100.0 * l_extendedprice + 0.5) AS bigint) AS cents,
         sum(cast(l_quantity AS bigint)) AS wsum
  FROM lineitem GROUP BY l_returnflag, cents
),
cum AS (
  SELECT l_returnflag, cents,
         sum(wsum) OVER (PARTITION BY l_returnflag ORDER BY cents) AS cw,
         sum(wsum) OVER (PARTITION BY l_returnflag) AS wtot
  FROM hist
)
SELECT l_returnflag,
       min(cents)::BIGINT AS wmedian_cents,
       max(wtot)::BIGINT AS total_weight
FROM cum WHERE cw >= ceil(wtot / 2.0)
GROUP BY l_returnflag ORDER BY l_returnflag
"""


REGISTRY_EXT35: dict[str, QuerySpec] = {
    "url_canonicalize_dedup": QuerySpec(
        q_url_canonicalize_dedup, _ORACLE_URL_CANON, "X1/X6 [EXT] URL canon dedup"
    ),
    "bpe_fertility_by_lang": QuerySpec(
        q_bpe_fertility_by_lang, _oracle_fertility(), "X6 [EXT] tokenizer fertility"
    ),
    "daily_percentile_bands": QuerySpec(
        q_daily_percentile_bands, _oracle_bands(), "X7 [EXT] p50/p95/p99 bands"
    ),
    "contrastive_margin_stats": QuerySpec(
        q_contrastive_margin_stats, _ORACLE_CONTRASTIVE, "X3 [EXT] margin eval"
    ),
    "grouped_weighted_median": QuerySpec(
        q_grouped_weighted_median, _ORACLE_WMEDIAN, "X7 [EXT] weighted median"
    ),
}
