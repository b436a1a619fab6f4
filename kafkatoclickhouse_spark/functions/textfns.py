"""Text-analysis column builders: tokenization, quality stats,
language-ID heuristic, fingerprinting.

All pure ``pyspark.sql.functions`` expressions (codegen'd, no UDF) —
and each has an exact ANSI-SQL twin so the text operators are
oracle-checkable. The reference's only text handling is the
required-field dirty-data check
(``MyKafkaDeserializationSchema.scala:47-60``); everything here is
engine-new surface mandated by the LLM-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish token pattern: letter runs, digit runs, or single
# non-alnum-non-space marks — a portable approximation of the GPT-2
# pre-tokenizer regex that both Spark and DuckDB regex engines accept.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# GPT-2-style pre-tokenizer for the byte-level BPE mode (r13):
# apostrophe contractions, space-prefixed letter/digit/punct runs,
# whitespace runs. The original's `\s+(?!\S)` lookahead is dropped —
# RE2 (DuckDB) has no lookahead — so interior whitespace runs stay
# whole; Java and RE2 agree on everything here (leftmost-first
# alternation, Unicode \p{L}/\p{N}), verified cross-engine in
# tests/test_bpetrain.py.
PRETOKEN_RE = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)
# the same pattern as a DuckDB string literal (quote-doubled)
PRETOKEN_RE_SQL = "'" + PRETOKEN_RE.replace("'", "''") + "'"


def pretoken_units(text: Column) -> Column:
    """Array of GPT-2-style pre-token units of ``text`` (JVM regex,
    no UDF). NULL text yields NULL — callers coalesce."""
    return F.regexp_extract_all(text, F.lit(PRETOKEN_RE), 0)


def hex_units(units: Column) -> Column:
    """Lowercase UTF-8 hex encoding of each unit — the byte mode's
    portable 256-symbol alphabet (two hex chars = one byte), twin of
    SQL ``lower(hex(encode(u)))``."""
    return F.transform(
        units, lambda u: F.lower(F.hex(F.encode(u, "UTF-8")))
    )

# Tiny per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic. Public common-word lists.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "nicht", "das"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "que", "los", "una"),
}

STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
)


def ws_token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank) as long."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish regex tokens as long."""
    return F.size(
        F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0)
    ).cast("long")


# The exact character set of the Java-regex class [A-Za-z0-9\s]
# (\s = [ \t\n\x0B\f\r], ASCII-only without UNICODE_CHARACTER_CLASS)
# — spelled out so punct_count can use translate() instead of a
# regex: char-map deletion is a measured 22× faster at sf10 (the
# punct regex was 26 of corpus_budget_select's 31 s/pass; VERDICT
# r11 #3) and counts IDENTICALLY, so every oracle stays green.
_ALNUM_WS = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "abcdefghijklmnopqrstuvwxyz"
    "0123456789 \t\n\x0b\x0c\r"
)


def punct_count(text: Column) -> Column:
    """Number of non-alnum, non-space characters, as long —
    value-identical to
    ``length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]',
    ''))`` (the SQL twin's spelling in :func:`sql_quality_expr`)."""
    return F.length(F.translate(text, _ALNUM_WS, "")).cast("long")


def stopword_count(text: Column) -> Column:
    """Count of whitespace tokens (lowercased) in STOPWORDS, as long."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    return F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in STOPWORDS]))
    ).cast("long")


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic (double, rounded 6dp):
    mean of (length score, low-punctuation score, stopword presence
    score). Mirrors common pretraining-data quality filters.
    """
    n_chars = F.length(text).cast("double")
    n_toks = ws_token_count(text).cast("double")
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    punct_ratio = F.when(
        n_chars > 0, punct_count(text).cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 5.0)
    stop_ratio = F.when(
        n_toks > 0, stopword_count(text).cast("double") / n_toks
    ).otherwise(F.lit(0.0))
    stop_score = F.least(stop_ratio * 4.0, F.lit(1.0))
    return F.round((len_score + punct_score + stop_score) / 3.0, 6)


def sql_quality_expr(
    n_chars: str, n_toks: str, n_punct: str, n_stop: str
) -> str:
    """The ONE SQL definition of :func:`quality_score` — same
    sub-expressions in the same order as the Column builder above, so
    the engines' doubles are identical. Callers substitute either CTE
    column names (``text_quality``'s oracle) or inline scalar
    expressions over ``text`` (``corpus_budget_select``'s oracle);
    there is no second copy of the formula to drift (ADVICE r9 #1 —
    the same single-definition rule applied to hash/encode helpers in
    commit 875979f). All four operands must already be DOUBLE-typed
    expressions."""
    return f"""ROUND((least({n_chars} / 500.0, 1.0)
                  + greatest(0.0, 1.0 - (CASE WHEN {n_chars} > 0
                        THEN {n_punct} / {n_chars} ELSE 0.0 END) * 5.0)
                  + least((CASE WHEN {n_toks} > 0
                        THEN {n_stop} / {n_toks} ELSE 0.0 END) * 4.0, 1.0)
                 ) / 3.0, 6)"""


def lang_marker_hits(text: Column, lang: str) -> Column:
    """Count of tokens matching the marker set of ``lang``, as long."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    markers = LANG_MARKERS[lang]
    return F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(m) for m in markers]))
    ).cast("long")


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase
    text — a portable stand-in for a rolling hash; identical output
    in any md5-capable engine.
    """
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))
