"""Text-analysis column expressions ([EXT] X6/X7, SURVEY §2.7).

All pure Catalyst expressions (split/filter/transform/regexp) — no Python in
the row path, so they run inside whole-stage codegen and scale linearly with
executors. Every expression here has an exactly-equivalent ANSI-SQL
formulation used by the DuckDB oracles (regex class syntax is kept to the
RE2 ∩ Java-regex common subset deliberately).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whitespace tokenizer: lowercase, split on runs of whitespace, drop empties.
TOKEN_SPLIT_REGEX = r"\s+"

# BPE-ish word/number/symbol tokenizer for token counting: letter runs,
# digit runs, or single non-space symbols (approximates subword pre-split).
BPE_PRETOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n]"

# Tiny per-language stopword marker lists for the n-gram/stopword language
# heuristic. Public common function words; priority order breaks ties.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "de", "et", "est", "que", "une"],
    "zh": ["de", "shi", "le", "zai", "you", "wo", "ta", "men"],
}
LANG_PRIORITY = ["en", "es", "de", "fr", "zh"]

# quote-free so the class embeds verbatim in single-quoted oracle SQL;
# hyphen last = literal in both Java regex and RE2
PUNCT_CLASS = "[.,!?;:(){}-]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens_expr(text: Column | str) -> Column:
    """Lowercased whitespace tokens with empties removed."""
    return F.filter(F.split(F.lower(_c(text)), TOKEN_SPLIT_REGEX), lambda t: t != F.lit(""))


def token_count_ws(text: Column | str) -> Column:
    return F.size(tokens_expr(text))


def token_count_regex(text: Column | str, pattern: str = BPE_PRETOKEN_REGEX) -> Column:
    """Token count under a BPE-ish pre-tokenization regex."""
    return F.size(F.regexp_extract_all(_c(text), F.lit(pattern), F.lit(0)))


def marker_hits(text: Column | str, markers: list[str]) -> Column:
    """Number of token occurrences that belong to a marker word list."""
    markers_arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens_expr(text), lambda t: F.array_contains(markers_arr, t)))


def lang_id_expr(text: Column | str) -> Column:
    """Stopword-marker language heuristic ([EXT] text analysis).

    Scores each candidate language by marker-token hits; picks the highest
    with a fixed priority order on ties (deterministic, oracle-matchable).
    """
    scores = {lang: marker_hits(text, LANG_MARKERS[lang]) for lang in LANG_PRIORITY}
    best = F.greatest(*scores.values())
    expr = F.lit("unknown")
    # build the CASE from lowest to highest priority so the highest-priority
    # language wins ties (when() chains evaluate first-match-wins).
    result = None
    for lang in LANG_PRIORITY:
        cond = (scores[lang] == best) & (best > F.lit(0))
        result = F.when(cond, F.lit(lang)) if result is None else result.when(cond, F.lit(lang))
    return result.otherwise(expr)


def punct_ratio(text: Column | str) -> Column:
    t = _c(text)
    stripped = F.regexp_replace(t, PUNCT_CLASS, "")
    return (F.length(t) - F.length(stripped)) / F.greatest(F.length(t), F.lit(1))


def stopword_ratio(text: Column | str, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or LANG_MARKERS["en"]
    return marker_hits(text, sw) / F.greatest(token_count_ws(text), F.lit(1))


def quality_score_expr(text: Column | str) -> Column:
    """Composite document-quality heuristic in [0,1]:
    rewards moderate length, penalizes punctuation soup, rewards stopword
    presence (fluent-text signal). Weights are fixed and documented so the
    oracle SQL reproduces them digit-for-digit.
    """
    t = _c(text)
    n_tok = token_count_ws(t)
    len_score = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    punct_pen = F.least(punct_ratio(t) * F.lit(4.0), F.lit(1.0))
    sw_score = F.least(stopword_ratio(t) * F.lit(5.0), F.lit(1.0))
    return (
        F.lit(0.5) * len_score + F.lit(0.3) * sw_score + F.lit(0.2) * (F.lit(1.0) - punct_pen)
    )


def fingerprint_md5(text: Column | str) -> Column:
    """Canonical document fingerprint: md5 of lowercased, trimmed,
    whitespace-normalized text. Stable across engines."""
    canon = F.regexp_replace(F.trim(F.lower(_c(text))), r"\s+", " ")
    return F.md5(canon)


def shingles_expr(text: Column | str, k: int = 3) -> Column:
    """Word k-shingles (k consecutive tokens joined by a space) — the unit
    set for MinHash/Jaccard near-dup detection."""
    toks = tokens_expr(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - F.lit(k), F.lit(0)))
    return F.when(
        n >= F.lit(k),
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
