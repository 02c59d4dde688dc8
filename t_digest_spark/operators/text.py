"""Text analysis for large-scale training-data pipelines: token
counting, quality scoring, language ID, document fingerprinting.

Everything here stays JVM-side (pyspark.sql.functions — codegen,
predicate-pushdown friendly) except where noted.  These run over the
``documents`` table (doc_id, text, lang, source, n_chars) but take any
DataFrame + column name.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "token_count", "char_stats", "quality_score", "lang_id",
    "fingerprint", "shingle_fingerprints", "word_hashes", "text_stats",
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


_SHINGLE_MULT = 0x9E3779B97F4A7C15  # odd golden-ratio polynomial base


def _splitmix64(x):
    """splitmix64 finalizer, vectorized over a uint64 ndarray (wraps
    mod 2^64 like the scalar reference)."""
    x = x.copy()
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def word_hashes(text: Column | str) -> Column:
    """array<long>: xxhash64 of each lowercased whitespace token — the
    shared JVM front half of shingle fingerprinting.  Single-level
    lambda on purpose: a transform's INPUT array is evaluated once,
    and the lambda touches only its own variable, so nothing
    re-evaluates per element."""
    text = F.col(text) if isinstance(text, str) else text
    return F.transform(_words(F.lower(text)), lambda w: F.xxhash64(w))


def _poly_fp(v: np.ndarray, mult: np.uint64) -> int:
    # 1-element ndarray accumulator: uint64 *array* ops wrap silently
    # (intended), whereas numpy *scalar* ops emit RuntimeWarnings on
    # overflow — looping with scalars spammed worker logs for every
    # short (< k words) document.
    acc = np.zeros(1, np.uint64)
    for x in v:
        acc *= mult
        acc += x
    return int(np.int64(_splitmix64(acc))[0])


EMPTY_FP = int(np.int64(_splitmix64(np.zeros(1, np.uint64))[0]))


def shingle_flat(flat: np.ndarray, lens_nz: np.ndarray,
                 k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-row k-shingle fingerprints from CONCATENATED word hashes of
    rows with len > 0 (uint64 flat array + per-row lengths).

    Returns ``(fp_flat, fp_lens, fp_offs)`` — row r's fingerprints are
    ``fp_flat[fp_offs[r]:fp_offs[r+1]]`` (int64).  Rows shorter than k
    words get ONE whole-sequence fingerprint.  This is the shared
    vectorized kernel behind both shingle_fingerprints and the fused
    minhash signature (operators/dedup.py) — their outputs must stay
    bit-identical."""
    mult = np.uint64(_SHINGLE_MULT)
    offs = np.concatenate(([0], np.cumsum(lens_nz)))
    n_win = np.maximum(lens_nz - k + 1, 0)
    fp_lens = np.maximum(n_win, 1)
    fp_offs = np.concatenate(([0], np.cumsum(fp_lens)))
    fp_flat = np.empty(int(fp_lens.sum()), dtype=np.int64)
    sel = np.flatnonzero(n_win > 0)
    if len(sel):
        reps = n_win[sel]
        base = np.repeat(offs[sel], reps)
        woffs = np.concatenate(([0], np.cumsum(reps)))
        ramp = np.arange(int(reps.sum()), dtype=np.int64) - \
            np.repeat(woffs[:-1], reps)
        starts = base + ramp
        h = np.zeros(len(starts), dtype=np.uint64)
        for j in range(k):
            h = h * mult + flat[starts + j]
        h = _splitmix64(h).astype(np.int64)
        fp_flat[np.repeat(fp_offs[sel], reps) + ramp] = h
    for r in np.flatnonzero(n_win == 0):
        fp_flat[fp_offs[r]] = _poly_fp(flat[offs[r]:offs[r + 1]], mult)
    return fp_flat, fp_lens, fp_offs


def shingle_fingerprints(text: Column | str, k: int = 5) -> Column:
    """Array of 64-bit fingerprints of the k-word shingles of the
    document — the fingerprint set feeding MinHash/Jaccard dedup.

    Split of work, chosen by measurement:

    - JVM side: tokenize once, hash each word once
      (``transform(words, xxhash64)`` — the lambda touches only its own
      variable, so nothing re-evaluates per element).  An earlier
      all-JVM form built each shingle with ``concat_ws(slice(words))``
      inside the transform lambda; Spark does NO common-subexpression
      elimination inside higher-order-function lambdas, so that
      re-tokenized the document once per SHINGLE and was 7-9x the
      total cost of the dedup signature stage.
    - Python side (Arrow-batched, fully vectorized): each shingle
      fingerprint is a degree-k polynomial over the k consecutive word
      hashes finished with a splitmix64 avalanche — one
      sliding-window gather + k fused multiply-adds per batch, no
      per-row loop for the common (n >= k) case.

    Documents with fewer than k words get ONE fingerprint of the whole
    word-hash sequence (so short duplicates still collide); empty text
    maps to the empty-sequence fingerprint; null text stays null."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    @pandas_udf(ArrayType(LongType()))
    def shingles(whs: pd.Series) -> pd.Series:
        n = len(whs)
        out: list = [None] * n
        vals = whs.to_numpy()
        lens = np.fromiter(
            (-1 if v is None else len(v) for v in vals),
            dtype=np.int64, count=n)
        for i in np.flatnonzero(lens == 0):
            out[i] = [EMPTY_FP]
        nz = np.flatnonzero(lens > 0)
        if len(nz) == 0:
            return pd.Series(out)
        flat = np.concatenate(
            [np.asarray(vals[i], dtype=np.int64) for i in nz]
        ).astype(np.uint64)
        fp_flat, _fp_lens, fp_offs = shingle_flat(flat, lens[nz], k)
        for t, i in enumerate(nz):
            # ndarray views, not .tolist(): Arrow converts numpy
            # slices without per-element boxing
            out[i] = fp_flat[fp_offs[t]:fp_offs[t + 1]]
        return pd.Series(out)

    return shingles(word_hashes(text))


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
