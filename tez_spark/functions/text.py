"""Text-analysis column functions for large-scale corpus pipelines.

All built from pyspark.sql.functions — JVM-side, codegen'd, no Python in
the hot path. These extend the reference's capability surface (Tez has no
scalar function library at all — SURVEY.md §2.4; row logic lives in user
processors): the operations a 100TB training-data pipeline needs over a
`documents`-shaped table.

Design rule: every function here is a Column -> Column transform so it
composes with any scan and stays inside whole-stage codegen; the DuckDB
oracles in text_queries.py mirror the exact same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small english/function-word list used by both language-ID and quality
# scoring. Deliberately tiny + hard-coded: it must be reproducible in the
# DuckDB oracle verbatim.
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "from", "that", "this", "be",
)


def tokens(text: str | Column) -> Column:
    """Whitespace tokenization, empty tokens dropped (same convention as
    Q03's wordcount — split on single space, filter '')."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def token_count(text: str | Column) -> Column:
    """Token count per document (BPE-ish subword counting is a tokenizer
    choice; whitespace count is the stable cross-engine baseline)."""
    return F.size(tokens(text)).cast("long")


def char_count(text: str | Column) -> Column:
    return F.length(text).cast("long")


def alpha_ratio(text: str | Column) -> Column:
    """Fraction of characters that are ASCII letters or space — a
    punctuation/noise proxy for quality filtering."""
    col = text if isinstance(text, Column) else F.col(text)
    clean = F.regexp_replace(col, "[^a-zA-Z ]", "")
    return F.when(F.length(col) > 0, F.length(clean) / F.length(col)).otherwise(
        F.lit(0.0)
    )


def stopword_count(text: str | Column) -> Column:
    """Number of tokens that are function words (case-sensitive: the
    fixtures are lowercase; keeps the oracle SQL trivially identical)."""
    toks = tokens(text)
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast("long")


def stopword_ratio(text: str | Column) -> Column:
    n = token_count(text)
    return F.when(n > 0, stopword_count(text) / n).otherwise(F.lit(0.0))


def avg_token_len(text: str | Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: str | Column) -> Column:
    """Composite quality heuristic in [0,1]: rewards function-word density
    (natural-language-ness) and alphabetic cleanliness, penalizes
    degenerate token lengths. Weights are arbitrary but fixed — the value
    is the *pipeline* (filter at scale), not the constants."""
    return (
        F.least(stopword_ratio(text) * 4.0, F.lit(1.0)) * 0.4
        + alpha_ratio(text) * 0.4
        + F.when((avg_token_len(text) >= 3) & (avg_token_len(text) <= 10), 0.2)
        .otherwise(F.lit(0.0))
    )


def fingerprint(text: str | Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token multiset — the classic shingle-free near-dup prefilter
    (catches reorderings/exact dups; MinHash in operators/dedup.py covers
    fuzzier overlap)."""
    toks = F.array_sort(F.array_distinct(tokens(text)))
    return F.md5(F.array_join(toks, " ").cast("binary"))
