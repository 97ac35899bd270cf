"""Text-analysis building blocks (SURVEY.md §2.B LLM extensions): tokenize,
shingles, language-ID lexicons, quality metrics. All pure Column expressions
(JVM-side, codegen-friendly) — no Python UDFs, so they scale to 100 TB
document tables without serialization overhead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword lexicons for the n-gram/stopword language-ID
#: heuristic; deliberately small and fixed so the DuckDB oracle can replay
#: the exact same rule.
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "a"),
    "de": ("der", "die", "und", "das", "ist", "ein", "nicht"),
    "fr": ("le", "la", "et", "les", "des", "est", "une"),
    "es": ("el", "la", "los", "de", "que", "es", "una"),
    "zh": ("的", "是", "了", "在", "我", "有", "不"),
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def word_shingles(tok: Column, k: int = 3) -> Column:
    """Distinct k-gram word shingles as an array<string>.

    transform(sequence(...)) keeps this a single JVM expression; at scale it
    is the map-side of MinHash/Jaccard dedup with no Python boundary.
    """
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(tok) - k, F.lit(0))),
            lambda i: F.array_join(F.slice(tok, i + 1, k), " "),
        )
    )


def lexicon_hits(tok: Column, lang: str) -> Column:
    """Number of tokens found in the language's stopword lexicon."""
    lex = F.array(*[F.lit(w) for w in LANG_LEXICONS[lang]])
    return F.size(F.filter(tok, lambda t: F.array_contains(lex, t)))


def token_count_regex(col: Column | str) -> Column:
    """BPE-ish token count: words, numbers, or single non-space symbols."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def punct_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(c) - F.length(F.regexp_replace(c, r"[.,;:!?'\"()]", ""))).cast("long")
