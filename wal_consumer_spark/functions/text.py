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


def let(value: Column, body) -> Column:
    """Let-bind `value` so `body` can reference it many times while it is
    evaluated ONCE per row.

    Spark's higher-order functions re-evaluate any captured subexpression
    tree on every lambda invocation (lambda bodies are full expression
    trees, and interpreted HOF evaluation has no common-subexpression
    cache). `transform(array(v), x -> body(x))[0]` binds v to a lambda
    variable, turning every inner reference into a variable lookup. This
    took MinHash signatures from O(perms * shingles) tokenizations per row
    to exactly one.
    """
    return F.transform(F.array(value), body)[0]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def word_shingles(tok: Column, k: int = 3) -> Column:
    """Distinct k-gram word shingles as an array<string>.

    A single JVM expression (no Python boundary); `tok` is let-bound so the
    tokenizer runs once per row, not once per shingle position.
    """
    return let(
        tok,
        lambda t: F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(t) - k, F.lit(0))),
                lambda i: F.array_join(F.slice(t, i + 1, k), " "),
            )
        ),
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
