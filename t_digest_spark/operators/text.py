"""Text analysis for large-scale training-data pipelines: token
counting, quality scoring, language ID, document fingerprinting.

Everything here stays JVM-side (pyspark.sql.functions — codegen,
predicate-pushdown friendly) except where noted.  These run over the
``documents`` table (doc_id, text, lang, source, n_chars) but take any
DataFrame + column name.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "token_count", "char_stats", "quality_score", "lang_id",
    "fingerprint", "shingle_fingerprints", "text_stats",
]

# tiny per-language stopword lists for the n-gram/stopword heuristic —
# enough to separate major languages, cheap to broadcast as literals
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for",
           "with", "was", "on", "are", "this"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht",
           "ein", "eine", "auf", "sich", "dem"],
    "fr": ["le", "la", "les", "et", "des", "est", "dans", "que", "pour",
           "une", "qui", "sur", "pas", "avec"],
    "es": ["el", "la", "los", "las", "de", "que", "en", "y", "una", "es",
           "del", "por", "con", "para"],
    "it": ["il", "la", "che", "di", "e", "un", "una", "per", "del", "con",
           "non", "sono", "nel", "alla"],
}


def _words(text: Column) -> Column:
    """Whitespace tokenization; empty string → empty array."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")) \
        .otherwise(F.split(t, r"\s+"))


def token_count(text: Column | str, mode: str = "whitespace") -> Column:
    """Token count: simple whitespace tokens, or a BPE-ish estimate
    (word-piece heuristic: words + extra pieces for long words, plus
    standalone punctuation/digit runs)."""
    text = F.col(text) if isinstance(text, str) else text
    if mode == "whitespace":
        return F.size(_words(text))
    if mode == "bpe_ish":
        words = _words(text)
        # ~1 piece per 4 chars of each word, minimum 1 — the standard
        # rough BPE estimate — plus punctuation runs counted separately
        pieces = F.aggregate(
            words, F.lit(0),
            lambda acc, w: acc + F.greatest(
                F.ceil(F.length(w) / 4).cast("int"), F.lit(1)))
        punct = F.length(F.regexp_replace(text, r"[^\p{Punct}]", ""))
        return (pieces + punct).cast("int")
    raise ValueError(mode)


def char_stats(text: Column | str) -> Column:
    """Struct of basic character-class statistics (all JVM regex)."""
    text = F.col(text) if isinstance(text, str) else text
    n = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^\p{L}]", ""))
    digit = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    punct = F.length(F.regexp_replace(text, r"[^\p{Punct}]", ""))
    space = F.length(F.regexp_replace(text, r"[^\s]", ""))
    return F.struct(
        n.alias("n_chars"),
        alpha.alias("n_alpha"),
        digit.alias("n_digit"),
        punct.alias("n_punct"),
        space.alias("n_space"),
    )


def quality_score(text: Column | str) -> Column:
    """Heuristic document quality in [0,1]: penalizes extreme length,
    high punctuation/digit ratios, very short/long mean word length —
    the usual cheap pre-filters of a training-data pipeline."""
    text = F.col(text) if isinstance(text, str) else text
    n = F.greatest(F.length(text), F.lit(1)).cast("double")
    words = _words(text)
    n_words = F.greatest(F.size(words), F.lit(1)).cast("double")
    mean_word = n / n_words
    punct_ratio = F.length(
        F.regexp_replace(text, r"[^\p{Punct}]", "")) / n
    digit_ratio = F.length(F.regexp_replace(text, r"[^0-9]", "")) / n
    len_score = F.when(F.length(text) < 16, F.lit(0.2)) \
        .when(F.length(text) > 100_000, F.lit(0.3)) \
        .otherwise(F.lit(1.0))
    word_score = F.when((mean_word >= 3) & (mean_word <= 12), F.lit(1.0)) \
        .otherwise(F.lit(0.5))
    punct_score = F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0))
    digit_score = F.lit(1.0) - F.least(digit_ratio * 2, F.lit(1.0))
    return (0.3 * len_score + 0.2 * word_score + 0.3 * punct_score
            + 0.2 * digit_score).alias("quality")


def lang_id(text: Column | str) -> Column:
    """Stopword-overlap language ID, entirely in Catalyst expressions:
    per language, count tokens hitting that language's stopword list;
    argmax wins, 'und' (undetermined) when nothing hits."""
    text = F.col(text) if isinstance(text, str) else text
    toks = F.transform(_words(text), lambda w: F.lower(w))
    scored = F.array(*[
        F.struct(
            F.size(F.array_intersect(
                toks, F.array(*[F.lit(s) for s in sw]))).alias("hits"),
            # negative tiebreak index keeps argmax deterministic
            F.lit(code).alias("lang"),
        )
        for code, sw in _STOPWORDS.items()
    ])
    best = F.array_max(scored)
    return F.when(best.getField("hits") > 0, best.getField("lang")) \
        .otherwise(F.lit("und"))


def fingerprint(text: Column | str, normalize: bool = True) -> Column:
    """64-bit document fingerprint for exact dedup: xxhash64 of the
    whitespace/case-normalized text (JVM, vectorized)."""
    text = F.col(text) if isinstance(text, str) else text
    if normalize:
        text = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return F.xxhash64(text)


def shingle_fingerprints(text: Column | str, k: int = 5) -> Column:
    """Array of 64-bit hashes of the k-word shingles of the document —
    the rolling-hash fingerprint set feeding MinHash/Jaccard dedup.
    Built with transform/slice/xxhash64 — no Python, no explode."""
    text = F.col(text) if isinstance(text, str) else text
    words = _words(F.lower(text))
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n < k, F.array(F.xxhash64(F.concat_ws(" ", words)))) \
        .otherwise(F.transform(
            idx, lambda i: F.xxhash64(
                F.concat_ws(" ", F.slice(words, i + 1, k)))))


def text_stats(df: DataFrame, text_col: str = "text",
               group_cols=("lang",)) -> DataFrame:
    """Per-group corpus statistics: docs, token/char totals, mean
    quality — the summary table of a pipeline health check."""
    group_cols = list(group_cols)
    enriched = df.select(
        *group_cols,
        token_count(text_col).alias("tokens"),
        F.length(text_col).alias("chars"),
        quality_score(text_col).alias("quality"),
    )
    return enriched.groupBy(*group_cols).agg(
        F.count("*").alias("n_docs"),
        F.sum("tokens").alias("total_tokens"),
        F.sum("chars").alias("total_chars"),
        F.avg("quality").alias("mean_quality"),
    )
