"""Text-analysis operators (SURVEY.md §2K, X-04): language-ID heuristic,
quality scoring, token counting (whitespace + BPE-ish regex), document
fingerprinting. All pure JVM-side expressions — the per-row text transforms
the reference does in pandas loops (normalize_text,
spark_kafka_consumer_dag.py:104-108) stay inside whole-stage codegen here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language marker sets for the n-gram/stopword language-ID heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of"],
    "de": ["der", "die", "und"],
    "fr": ["le", "la", "et"],
    "es": ["el", "los", "y"],
}

#: BPE-ish tokenizer: word pieces or single non-space symbols
BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def whitespace_token_count(text: Column) -> Column:
    return F.size(F.split(F.trim(text), r"\s+"))


def bpe_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_PATTERN), 0))


def marker_hits(text: Column, markers: list[str]) -> Column:
    """Count of marker-word occurrences (word-bounded)."""
    pat = r"\b(" + "|".join(markers) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), 0))


def lang_guess(text: Column) -> Column:
    """argmax over marker-hit counts, 'und' when no markers hit; ties resolved
    by the fixed language order (deterministic in both engines)."""
    expr: Column = F.lit("und")
    best: Column = F.lit(0)
    for lang in LANG_MARKERS:  # insertion order = priority on ties
        hits = marker_hits(text, LANG_MARKERS[lang])
        expr = F.when(hits > best, F.lit(lang)).otherwise(expr)
        best = F.greatest(best, hits)
    return expr


def quality_score(text: Column) -> Column:
    """Length/punctuation/stopword-ratio quality score in [0,1] — the standard
    pretraining-corpus filter shape, engine-portable arithmetic only."""
    n_tokens = whitespace_token_count(text).cast("double")
    n_chars = F.length(text).cast("double")
    stop_ratio = marker_hits(text, STOPWORDS).cast("double") / n_tokens
    punct_ratio = (
        F.size(F.regexp_extract_all(text, F.lit(r"[^\w\s]"), 0)).cast("double") / n_chars
    )
    len_score = F.least(n_tokens / 100.0, F.lit(1.0))
    return F.round(
        0.5 * len_score + 0.3 * F.least(stop_ratio * 4.0, F.lit(1.0)) + 0.2 * (1.0 - punct_ratio),
        6,
    )


def fingerprint(text: Column) -> Column:
    """Normalized-content fingerprint: md5 of (lower, collapse-ws, trim)."""
    return F.md5(
        F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")).cast("binary")
    )


#: Rabin-Karp rolling-hash parameters: base fits tokens-hashes < 2^31 so
#: acc*B + h < 2^31 * 2^31 never overflows int64 in either engine
RH_BASE = 1_000_003
RH_MOD = 2_147_483_647  # 2^31 - 1


def rolling_fingerprint(tokens: Column) -> Column:
    """Order-sensitive polynomial rolling hash over a token array:
    acc_i = (acc_{i-1} * B + h(token_i)) mod P — the incremental-update
    fingerprint family (Rabin-Karp); unlike the md5 fingerprint it can be
    extended chunk-by-chunk without rereading the document. Left fold, exact
    int64 in both engines."""
    from .dedup import hash64

    return F.aggregate(
        tokens,
        F.expr("0L"),
        lambda acc, t: (acc * RH_BASE + hash64("rh", t) % RH_MOD) % RH_MOD,
    )


def oracle_rolling_fingerprint(tokens_expr: str) -> str:
    from .dedup import oracle_hash64

    h = oracle_hash64("rh", "t")
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({tokens_expr}, t -> {h} % {RH_MOD})), "
        f"(acc, h) -> (acc * {RH_BASE} + h) % {RH_MOD})"
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins (kept textually adjacent so drift is visible in review)
# ---------------------------------------------------------------------------


def oracle_marker_hits(expr: str, markers: list[str]) -> str:
    pat = r"\b(" + "|".join(markers) + r")\b"
    return f"len(regexp_extract_all(lower({expr}), '{pat}'))"


def oracle_lang_guess(expr: str) -> str:
    sql = "'und'"
    best = "0"
    for lang in LANG_MARKERS:
        hits = oracle_marker_hits(expr, LANG_MARKERS[lang])
        sql = f"CASE WHEN {hits} > {best} THEN '{lang}' ELSE {sql} END"
        best = f"greatest({best}, {hits})"
    return sql


def oracle_quality_score(expr: str) -> str:
    n_tokens = f"len(string_split_regex(trim({expr}), '\\s+'))::DOUBLE"
    n_chars = f"length({expr})::DOUBLE"
    stop = oracle_marker_hits(expr, STOPWORDS)
    punct = f"len(regexp_extract_all({expr}, '[^\\w\\s]'))::DOUBLE"
    return (
        f"ROUND(0.5 * least({n_tokens} / 100.0, 1.0)"
        f" + 0.3 * least(({stop})::DOUBLE / {n_tokens} * 4.0, 1.0)"
        f" + 0.2 * (1.0 - {punct} / {n_chars}), 6)"
    )
