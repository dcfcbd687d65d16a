"""Text-analysis operators for large-scale training-data pipelines.

All pure JVM-side column expressions (whole-stage codegen, no Python in
the hot path) and deliberately engine-portable: every operator has an
exact ANSI-SQL twin runnable by DuckDB (see ``__spark_entry__.oracle_sql``),
which is how the driver's correctness gate verifies them.

Operates on the ``documents`` table shape
(doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# deterministic marker-token lists for the n-gram language heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "los", "las"],
}

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

WORD_SPLIT = r"\s+"


def _words(col):
    return F.split(F.trim(F.lower(col)), WORD_SPLIT)


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish regex token count
    (word pieces and punctuation as separate tokens)."""
    words = _words(F.col(text_col))
    bpe = F.regexp_extract_all(
        F.col(text_col), F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0
    )
    return df.select(
        "doc_id",
        F.size(words).alias("n_ws_tokens"),
        F.size(bpe).alias("n_bpe_tokens"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a single
    blended score (deterministic arithmetic, rounded for cross-engine
    comparability)."""
    t = F.col(text_col)
    words = _words(t)
    n_words = F.size(words)
    n_chars = F.length(t)
    punct = F.length(F.regexp_replace(t, r"[^.!?,;:]", ""))
    stops = F.size(F.filter(words, lambda w: w.isin(STOPWORDS)))
    mean_word_len = n_chars.cast("double") / F.greatest(n_words, F.lit(1))
    stop_ratio = stops.cast("double") / F.greatest(n_words, F.lit(1))
    punct_ratio = punct.cast("double") / F.greatest(n_chars, F.lit(1))
    score = (
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
        + stop_ratio * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.2
    )
    return df.select(
        "doc_id",
        n_chars.alias("n_chars_q"),
        n_words.alias("n_words"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(score, 4).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token language heuristic: count marker hits per language,
    argmax with a fixed tie order (en > de > fr > es > unknown)."""
    words = _words(F.col(text_col))

    def marker_count(markers: list[str]):
        # NOTE: a default-arg lambda here would become a 2-arg (element,
        # index) lambda in F.filter — keep a single-parameter closure.
        return F.size(F.filter(words, lambda w: w.isin(markers)))

    scores = {lang: marker_count(m) for lang, m in LANG_MARKERS.items()}
    pred = F.lit("unknown")
    best = F.lit(0)
    # reversed so earlier languages win ties
    for lang in reversed(list(LANG_MARKERS)):
        s = scores[lang]
        pred = F.when(s >= best, F.lit(lang)).otherwise(pred)
        best = F.greatest(best, s)
    return df.select(
        "doc_id",
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_MARKERS],
        F.when(best > 0, pred).otherwise(F.lit("unknown")).alias("pred_lang"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Two document fingerprints: exact (md5 of whitespace-normalized
    text) and content (md5 of the sorted distinct word set — order-
    insensitive near-identity)."""
    t = F.col(text_col)
    norm = F.lower(F.trim(F.regexp_replace(t, r"\s+", " ")))
    wordset = F.array_sort(F.array_distinct(_words(t)))
    return df.select(
        "doc_id",
        F.md5(norm).alias("fp_exact"),
        F.md5(F.concat_ws(" ", wordset)).alias("fp_content"),
    )
