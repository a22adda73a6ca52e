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


def stopword_ratio_from(toks: Column) -> Column:
    """Stopword fraction over an already-tokenized lower(text) column.
    Passing the token array lets callers tokenize ONCE and share it across
    the language/quality expressions — Catalyst does not CSE the regexp
    split across sibling expressions, so inlining ``tokens()`` five times
    costs five regexp passes per row (measured ~6x on the curation
    pipeline)."""
    hits = F.size(F.filter(toks, lambda t: t.isin(_STOPWORDS)))
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(hits / n)


def stopword_ratio(c: Column) -> Column:
    """Fraction of tokens that are common English stopwords."""
    return stopword_ratio_from(tokens(F.lower(c)))


def quality_score_from(c: Column, toks: Column) -> Column:
    """quality_score over a shared pre-tokenized lower(text) column."""
    length_score = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    sw = stopword_ratio_from(toks)
    sw_score = F.least(sw * 5.0, F.lit(1.0))
    punct_penalty = F.least(punct_ratio(c) * 4.0, F.lit(1.0))
    # raw double on purpose: the expression tree is fixed-order IEEE ops, so
    # any engine evaluating the same tree reproduces it bit-exactly
    return length_score * 0.4 + sw_score * 0.4 + (1.0 - punct_penalty) * 0.2


def quality_score(c: Column) -> Column:
    """Composite heuristic quality score in [0,1]: rewards mid-length docs and
    a sane stopword presence, penalizes punctuation soup. Deterministic and
    SQL-expressible (oracle-checkable)."""
    return quality_score_from(c, tokens(F.lower(c)))


# Tiny per-language marker lexicons (n-gram/stopword heuristic language ID).
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "to"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "es", "los"],
    "it": ["il", "la", "che", "di", "non"],
}


def lang_scores_from(toks: Column) -> dict[str, Column]:
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_scores(c: Column) -> dict[str, Column]:
    return lang_scores_from(tokens(F.lower(c)))


def argmax_lang(scores: dict[str, Column]) -> Column:
    """Deterministic argmax over per-language score columns: the language
    with the most marker hits, 'und' when none fire; ties break by
    language-code order.

    Built as ``greatest(struct(score, -lang_index))`` — a LINEAR expression
    tree in which each score appears exactly once. The naive
    when()-chain argmax nests best_score inside itself, so each score
    expression is duplicated exponentially (measured: ~30 copies of each
    marker filter in the optimized plan once a filter pushdown
    re-substitutes the chain); struct-comparison greatest cannot blow up
    that way. Ties on score pick the greater -index = the
    lexicographically-first language, matching the chain semantics."""
    langs = sorted(scores)
    best = F.greatest(
        *[
            F.struct(scores[lang].alias("s"), F.lit(-i).alias("ni"))
            for i, lang in enumerate(langs)
        ]
    )
    name = F.element_at(F.array(*[F.lit(lang) for lang in langs]), 1 - best["ni"])
    return F.when(best["s"] > 0, name).otherwise(F.lit("und"))


def lang_id_from(toks: Column) -> Column:
    """lang_id over a shared pre-tokenized lower(text) column (see
    stopword_ratio_from for why callers should materialize the tokens).
    NOTE: as a single Column this still inlines the score expressions into
    the argmax chain; hot paths should materialize lang_scores_from() into
    real columns and call argmax_lang on those."""
    return argmax_lang(lang_scores_from(toks))


def lang_id(c: Column) -> Column:
    """Pick the language with the most marker-token hits; 'und' when no
    marker fires. Ties break by language-code order (deterministic)."""
    return lang_id_from(tokens(F.lower(c)))


def fingerprint(c: Column) -> Column:
    """60-bit content fingerprint of the normalized text (rolling-hash
    analog; md5-based so it is engine-portable)."""
    return md5_long(normalize(c))


def repetition_stats(df, text_col: str, id_col: str):
    """Gopher-style repetition metrics per document (Rae et al. 2021, the
    repetition-removal family of quality rules): word-bigram statistics over
    the normalized text — the fraction of bigram mass held by the most
    frequent bigram (``top_bigram_ppm``) and by bigrams occurring >= 2 times
    (``dup_bigram_ppm``) — plus word count and mean word length.

    Shapes for scale: the document text never shuffles — only 60-bit md5
    bigram hashes explode into the (doc, bigram) count, and both
    aggregations are partial-aggregable map-side. All ratios are integer
    ppm (``x * 1e6 div y``), so results are bit-identical on any engine.

    Returns (id, n_words, mean_word_len_ppm, top_bigram_ppm, dup_bigram_ppm);
    the bigram ppms are NULL for docs with < 2 words (no bigram exists).
    """
    from pyspark.sql import functions as F

    from etl_mssql_to_postgres_dailysync_spark.functions.hashing import md5_long

    base = df.select(
        F.col(id_col).alias("doc"),
        F.split(normalize(F.col(text_col)), " ").alias("toks"),
    ).select(
        "doc", "toks", F.size("toks").alias("n_words"),
        # total token chars = normalized length minus the n-1 separators
        (F.length(F.array_join(F.col("toks"), " ")) - F.size("toks") + 1)
        .alias("n_tok_chars"),
    )
    # zip_with over two slices, NOT element_at(toks, i) in a lambda (which
    # re-evaluates the outer array per element — see dedup.py microbench)
    bigrams = base.select(
        "doc",
        F.explode(
            F.zip_with(
                F.slice(F.col("toks"), 1, F.greatest(F.size("toks") - 1, F.lit(0))),
                F.slice(F.col("toks"), 2, F.greatest(F.size("toks") - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("bg"),
    ).select("doc", md5_long(F.col("bg")).alias("bgh"))
    rep = (
        bigrams.groupBy("doc", "bgh").agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc")
        .agg(
            F.max("cnt").alias("top_cnt"),
            F.sum("cnt").alias("total_bg"),
            F.sum(F.when(F.col("cnt") >= 2, F.col("cnt")).otherwise(0)).alias("dup_cnt"),
        )
    )
    return (
        base.join(rep, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.col("n_words").cast("long").alias("n_words"),
            F.expr("n_tok_chars * 1000000 div n_words").alias("mean_word_len_ppm"),
            F.expr("top_cnt * 1000000 div total_bg").alias("top_bigram_ppm"),
            F.expr("dup_cnt * 1000000 div total_bg").alias("dup_bigram_ppm"),
        )
    )


def build_vocab(df, text_col: str, *, size: int = 256) -> list[tuple[str, int]]:
    """Top-``size`` tokens of the normalized corpus by (count desc, token asc),
    as (token, id) pairs with ids 0..size-1.

    The vocab is tiny by construction, so collecting it to the driver is the
    broadcast pattern (same shape as the IVF centroid fit): one distributed
    explode+count+TakeOrdered job, then the result ships to every executor
    inside the encode expression — the 100 TB encode pass itself is
    shuffle-free."""
    toks = df.select(F.explode(tokens(normalize(F.col(text_col)))).alias("t"))
    rows = (
        toks.groupBy("t")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("t"))
        .limit(size)
        .collect()
    )
    return [(r["t"], i) for i, r in enumerate(rows)]


def encode_token_ids(
    df, text_col: str, id_col: str, vocab: list[tuple[str, int]], *, oov_buckets: int = 256
):
    """Tokenizer-style id encoding: each normalized whitespace token maps to
    its vocab id, out-of-vocab tokens to ``len(vocab) + md5(token) %
    oov_buckets`` (deterministic hash buckets, the feature-hashing trick).

    The vocab rides along as a map literal inside the expression — a pure
    map operator over the scan, no join, no shuffle; at 100 TB this is one
    codegen pass per document."""
    size = len(vocab)
    mapping = F.map_from_arrays(
        F.array(*[F.lit(t) for t, _ in vocab]),
        F.array(*[F.lit(i) for _, i in vocab]),
    )
    toks = tokens(normalize(F.col(text_col)))
    ids = F.transform(
        toks,
        lambda t: F.coalesce(
            F.element_at(mapping, t).cast("long"),
            F.lit(size) + md5_long(t) % oov_buckets,
        ),
    )
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        ids.alias("token_ids"),
    )
