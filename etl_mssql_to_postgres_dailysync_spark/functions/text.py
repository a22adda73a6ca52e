"""Text analysis for training-data pipelines over the ``documents`` table:
tokenization, token counting, quality scoring, language ID, fingerprinting.

All JVM-side built-in expressions (no Python UDFs): at 100 TB these run
inside whole-stage codegen over the parquet scan, shuffle-free (pure map
operators), so they scale linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from etl_mssql_to_postgres_dailysync_spark.functions.hashing import md5_long


def normalize(c: Column) -> Column:
    """Canonical form for hashing/dedup: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(c: Column) -> Column:
    """Whitespace tokenization of trimmed text -> array<string>."""
    return F.split(F.trim(c), r"\s+")


def token_count(c: Column) -> Column:
    """Whitespace token count."""
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(tokens(c)))


def bpe_ish_token_count(c: Column) -> Column:
    """BPE-ish proxy token count: word-piece-like segments = runs of letters,
    runs of digits, or single non-space symbols (a common pre-tokenizer
    approximation when no tokenizer model is shippable)."""
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"), 0))


def char_count(c: Column) -> Column:
    return F.length(c)


def punct_ratio(c: Column) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[!-/:-@\[-`{-~]", ""))
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(punct / F.length(c))


_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def stopword_ratio(c: Column) -> Column:
    """Fraction of tokens that are common English stopwords."""
    toks = tokens(F.lower(c))
    hits = F.size(F.filter(toks, lambda t: t.isin(_STOPWORDS)))
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(hits / n)


def quality_score(c: Column) -> Column:
    """Composite heuristic quality score in [0,1]: rewards mid-length docs and
    a sane stopword presence, penalizes punctuation soup. Deterministic and
    SQL-expressible (oracle-checkable)."""
    length_score = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    sw = stopword_ratio(c)
    sw_score = F.least(sw * 5.0, F.lit(1.0))
    punct_penalty = F.least(punct_ratio(c) * 4.0, F.lit(1.0))
    # raw double on purpose: the expression tree is fixed-order IEEE ops, so
    # any engine evaluating the same tree reproduces it bit-exactly
    return length_score * 0.4 + sw_score * 0.4 + (1.0 - punct_penalty) * 0.2


# Tiny per-language marker lexicons (n-gram/stopword heuristic language ID).
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "to"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "es", "los"],
    "it": ["il", "la", "che", "di", "non"],
}


def lang_scores(c: Column) -> dict[str, Column]:
    toks = tokens(F.lower(c))
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(c: Column) -> Column:
    """Pick the language with the most marker-token hits; 'und' when no
    marker fires. Ties break by language-code order (deterministic)."""
    scores = lang_scores(c)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(scores):  # later langs win only on strictly higher score
        s = scores[lang]
        take = s > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, s).otherwise(best_score)
    return best_lang


def fingerprint(c: Column) -> Column:
    """60-bit content fingerprint of the normalized text (rolling-hash
    analog; md5-based so it is engine-portable)."""
    return md5_long(normalize(c))
