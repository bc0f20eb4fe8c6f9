"""Operator registry, wave 73: data-stewardship tier — golden-record
survivorship (MDM), bad-record quarantine for semi-structured intake,
and an OOV (out-of-vocabulary) coverage audit.

Scale stances:
- Golden record: attribute-level survivorship ("latest non-null wins,
  ts + event_id tie-break") folds as per-entity MAX over an encoded
  zero-padded sortable key — one grouped aggregate, map-side
  combinable, no window at all. Different attributes may survive from
  DIFFERENT source events, which is the real MDM semantics.
- Quarantine: malformed payloads are detected row-local (from_json
  PERMISSIVE on Spark; json_valid on the oracle) and the audit is one
  aggregate — the classic bronze-layer good/bad fork with zero extra
  passes.
- OOV audit: the top-K vocabulary is a bounded TakeOrdered head
  (K = 1000 rows global, driver-sized by construction) broadcast
  against the token stream; per-lang occurrence and type coverage
  rates come from one grouped aggregate each.

Reference parity: none; [EXT] X6/X9/W tier per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import QuerySpec, _t

# --------------------------------------------------------------------------
# Golden-record survivorship (X9/W [EXT])
# --------------------------------------------------------------------------

# synthetic profile facts carried by specific event families: the MDM
# scenario where each source system emits a subset of attributes
_GR_FIELDS = {
    "plan": ("purchase", ["basic", "pro", "max"], 3),
    "region": ("view", ["na", "eu", "apac", "latam", "mea"], 5),
    "device": ("click", ["ios", "android", "web", "tv"], 4),
}


def _gr_field_case(field: str) -> str:
    etype, values, mod = _GR_FIELDS[field]
    whens = " ".join(
        f"WHEN {i} THEN '{v}'" for i, v in enumerate(values)
    )
    return (
        f"CASE WHEN event_type = '{etype}' THEN "
        f"(CASE cast(get_json_object(props, '$.k') as bigint) % {mod} {whens} END) "
        f"ELSE NULL END"
    )


def _gr_field_case_duck(field: str) -> str:
    etype, values, mod = _GR_FIELDS[field]
    whens = " ".join(f"WHEN {i} THEN '{v}'" for i, v in enumerate(values))
    return (
        f"CASE WHEN event_type = '{etype}' THEN "
        f"(CASE cast(json_extract(props, '$.k') AS bigint) % {mod} {whens} END) "
        f"ELSE NULL END"
    )


def q_golden_record_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X9/W golden-record survivorship: each event family emits
    a subset of profile attributes (purchase->plan, view->region,
    click->device); the golden profile per user takes, PER ATTRIBUTE,
    the value from the latest event carrying it ("latest non-null
    wins", ts then event_id tie-break) — so one user's golden row can
    merge three different source events. Implemented as MAX over a
    zero-padded sortable (ts, event_id, value) string per attribute —
    one grouped aggregate, no window, map-side combinable. Also
    reports attribute completeness and the number of contributing
    source families."""
    ev = _t(spark, sf_dir, "events")
    enc = ev.selectExpr(
        "user_id",
        "event_type",
        "unix_micros(ts) as tsu",
        "event_id",
        *[f"{_gr_field_case(f)} as f_{f}" for f in _GR_FIELDS],
    )
    aggs = []
    for f in _GR_FIELDS:
        key = (
            f"CASE WHEN f_{f} IS NOT NULL THEN "
            f"lpad(cast(tsu as string), 20, '0') || lpad(cast(event_id as string), 12, '0')"
            f" || '|' || f_{f} END"
        )
        aggs.append(F.expr(f"max({key})").alias(f"enc_{f}"))
    aggs.append(
        F.expr(
            "cast(count(distinct CASE WHEN f_plan IS NOT NULL OR f_region IS NOT NULL "
            "OR f_device IS NOT NULL THEN event_type END) as bigint)"
        ).alias("n_sources")
    )
    g = enc.groupBy("user_id").agg(*aggs)
    outs = ["user_id"]
    for f in _GR_FIELDS:
        outs.append(f"substr(enc_{f}, 34) as {f}")
    comp = " + ".join(f"(CASE WHEN enc_{f} IS NOT NULL THEN 1 ELSE 0 END)" for f in _GR_FIELDS)
    outs.append(f"cast({comp} as bigint) as completeness")
    outs.append("n_sources")
    return g.selectExpr(*outs).orderBy("user_id")


def _oracle_golden() -> str:
    field_exprs = ", ".join(
        f"{_gr_field_case_duck(f)} AS f_{f}" for f in _GR_FIELDS
    )
    enc_exprs = ", ".join(
        f"max(CASE WHEN f_{f} IS NOT NULL THEN "
        f"lpad(cast(tsu AS varchar), 20, '0') || lpad(cast(event_id AS varchar), 12, '0')"
        f" || '|' || f_{f} END) AS enc_{f}"
        for f in _GR_FIELDS
    )
    comp = " + ".join(
        f"(CASE WHEN enc_{f} IS NOT NULL THEN 1 ELSE 0 END)" for f in _GR_FIELDS
    )
    field_outs = ", ".join(f"substr(enc_{f}, 34) AS {f}" for f in _GR_FIELDS)
    return f"""
WITH enc AS (
  SELECT user_id, event_type, epoch_us(ts) AS tsu, event_id, {field_exprs}
  FROM events
),
g AS (
  SELECT user_id, {enc_exprs},
         count(DISTINCT CASE WHEN f_plan IS NOT NULL OR f_region IS NOT NULL
                             OR f_device IS NOT NULL THEN event_type END)::BIGINT
           AS n_sources
  FROM enc GROUP BY user_id
)
SELECT user_id, {field_outs}, cast({comp} AS bigint) AS completeness, n_sources
FROM g ORDER BY user_id
"""


# --------------------------------------------------------------------------
# Bad-record quarantine (S5/W [EXT])
# --------------------------------------------------------------------------

_BAD_MOD = 7  # o_orderkey % 7 == 3 -> payload truncated (malformed)


def q_bad_record_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] S5/W bronze-intake quarantine: a JSON payload stream
    (built deterministically from orders; every {m}th record is
    truncated mid-object) is parsed with from_json in PERMISSIVE mode
    with a corrupt-record column — the canonical Spark bad-record
    fork. The audit aggregates good/quarantined counts, the recovered
    key sum over good rows, and distinct recovered statuses; the
    quarantined raw payloads stay addressable (count of non-null
    corrupt column equals the bad count). Row-local parse + one
    aggregate — nothing about this shape changes at 100 TB."""
    o = _t(spark, sf_dir, "orders")
    payload = (
        "concat('{\"k\": ', cast(o_orderkey as string), ', \"s\": \"', o_orderstatus, '\"}')"
    )
    j = (
        f"CASE WHEN o_orderkey % {_BAD_MOD} = 3 "
        f"THEN substr({payload}, 1, length({payload}) - 2) ELSE {payload} END"
    )
    parsed = o.selectExpr(f"{j} as raw").selectExpr(
        "raw",
        "from_json(raw, 'k bigint, s string, _corrupt string', "
        "map('mode', 'PERMISSIVE', 'columnNameOfCorruptRecord', '_corrupt')) as p",
    )
    return parsed.agg(
        F.count(F.lit(1)).cast("bigint").alias("total"),
        F.sum(F.when(F.col("p._corrupt").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("quarantined"),
        F.sum(F.when(F.col("p._corrupt").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("good"),
        F.sum(F.when(F.col("p._corrupt").isNull(), F.col("p.k")).otherwise(0))
        .cast("bigint")
        .alias("good_key_sum"),
        F.countDistinct(F.when(F.col("p._corrupt").isNull(), F.col("p.s")))
        .cast("bigint")
        .alias("good_statuses"),
    )


_ORACLE_QUARANTINE = f"""
WITH payloads AS (
  SELECT '{{"k": ' || cast(o_orderkey AS varchar) || ', "s": "' || o_orderstatus || '"}}' AS full_j,
         o_orderkey
  FROM orders
),
stream AS (
  SELECT CASE WHEN o_orderkey % {_BAD_MOD} = 3
              THEN substr(full_j, 1, length(full_j) - 2) ELSE full_j END AS raw
  FROM payloads
),
parsed AS (
  SELECT raw, json_valid(raw) AS ok,
         CASE WHEN json_valid(raw) THEN cast(json_extract(raw, '$.k') AS bigint) END AS k,
         CASE WHEN json_valid(raw) THEN json_extract_string(raw, '$.s') END AS s
  FROM stream
)
SELECT count(*)::BIGINT AS total,
       sum(CASE WHEN NOT ok THEN 1 ELSE 0 END)::BIGINT AS quarantined,
       sum(CASE WHEN ok THEN 1 ELSE 0 END)::BIGINT AS good,
       sum(CASE WHEN ok THEN k ELSE 0 END)::BIGINT AS good_key_sum,
       count(DISTINCT CASE WHEN ok THEN s END)::BIGINT AS good_statuses
FROM parsed
"""


# --------------------------------------------------------------------------
# OOV coverage audit (X6 [EXT])
# --------------------------------------------------------------------------

_OOV_VOCAB = 1000


def q_oov_rate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] X6 out-of-vocabulary audit: build the top-{k} corpus
    vocabulary (count desc, token asc tie-break — a bounded
    TakeOrdered head, driver-sized by construction), broadcast it
    against the token stream, and report per-lang OOV rates two ways:
    occurrence-weighted (what a tokenizer actually hits) and
    type-weighted (distinct tokens). The gap between the two is the
    long-tail signal a vocab-sizing decision needs."""
    d = _t(spark, sf_dir, "documents")
    toks = d.selectExpr(
        "lang",
        "explode(filter(split(lower(text), '\\\\s+'), t -> t <> '')) as tok",
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(_OOV_VOCAB)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    marked = toks.join(F.broadcast(vocab), "tok", "left")
    occ = marked.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occ"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("oov_occ"),
    )
    types = (
        marked.select("lang", "tok", "in_vocab")
        .distinct()
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("oov_types"),
        )
    )
    return (
        occ.join(types, "lang")
        .select(
            "lang",
            "n_occ",
            "oov_occ",
            "n_types",
            "oov_types",
            F.floor(
                F.col("oov_occ").cast("double") / F.col("n_occ").cast("double") * 1e6
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("oov_occ_rate_micro"),
            F.floor(
                F.col("oov_types").cast("double") / F.col("n_types").cast("double") * 1e6
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("oov_type_rate_micro"),
        )
        .orderBy("lang")
    )


_ORACLE_OOV = rf"""
WITH toks AS (
  SELECT lang, unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  t -> t <> '')) AS tok
  FROM documents
),
vocab AS (
  SELECT tok FROM (
    SELECT tok, count(*)::BIGINT AS cnt FROM toks GROUP BY tok
  ) ORDER BY cnt DESC, tok ASC LIMIT {_OOV_VOCAB}
),
marked AS (
  SELECT t.lang, t.tok, v.tok IS NOT NULL AS in_vocab
  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
),
occ AS (
  SELECT lang, count(*)::BIGINT AS n_occ,
         sum(CASE WHEN NOT in_vocab THEN 1 ELSE 0 END)::BIGINT AS oov_occ
  FROM marked GROUP BY lang
),
types AS (
  SELECT lang, count(*)::BIGINT AS n_types,
         sum(CASE WHEN NOT in_vocab THEN 1 ELSE 0 END)::BIGINT AS oov_types
  FROM (SELECT DISTINCT lang, tok, in_vocab FROM marked) GROUP BY lang
)
SELECT occ.lang, n_occ, oov_occ, n_types, oov_types,
       cast(floor(cast(oov_occ AS double) / cast(n_occ AS double) * 1000000.0 + 0.5)
            AS bigint) AS oov_occ_rate_micro,
       cast(floor(cast(oov_types AS double) / cast(n_types AS double) * 1000000.0 + 0.5)
            AS bigint) AS oov_type_rate_micro
FROM occ JOIN types USING (lang)
ORDER BY lang
"""


REGISTRY_EXT72: dict[str, QuerySpec] = {
    "golden_record_survivorship": QuerySpec(
        q_golden_record_survivorship, _oracle_golden(), "X9/W [EXT] MDM golden record"
    ),
    "bad_record_quarantine": QuerySpec(
        q_bad_record_quarantine, _ORACLE_QUARANTINE, "S5/W [EXT] intake quarantine"
    ),
    "oov_rate_audit": QuerySpec(q_oov_rate_audit, _ORACLE_OOV, "X6 [EXT] OOV coverage"),
}


# A bare string literal followed by .format() is an expression,
# not a docstring (__doc__ was silently None) — re-apply the
# parameterization on the real docstrings (VERDICT r10 ADVICE #1,
# whole-class fix):
q_bad_record_quarantine.__doc__ = q_bad_record_quarantine.__doc__.format(m=_BAD_MOD)  # noqa: E501
q_oov_rate_audit.__doc__ = q_oov_rate_audit.__doc__.format(k=_OOV_VOCAB)  # noqa: E501
