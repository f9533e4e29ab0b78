"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All column expressions are JVM built-ins (regexp / split / aggregate) —
no Python in the row path — and every heuristic is deterministic and
SQL-expressible so the DuckDB oracle can replay it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny marker-word lists per language for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ("the", "and", "of", "a", "to"),
    "de": ("der", "und", "die", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "que", "y", "en"),
}


def _count_word(text_col, word: str):
    """Occurrences of a whole word (space-delimited) in the text."""
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / F.length(F.lit(needle))
    ).cast("long")


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: argmax of marker-word counts, 'und'
    (undetermined) when every score is zero. Ties break by language
    code order."""
    scores = [
        sum([_count_word(text_col, w) for w in words]).alias(f"score_{lang}")
        for lang, words in LANG_MARKERS.items()
    ]
    scored = df.select(F.col(id_col), *scores)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_MARKERS])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in sorted(LANG_MARKERS):
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.select(id_col, *[f"score_{lang}" for lang in LANG_MARKERS], pred.alias("pred_lang"))


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Cheap quality features: char/word counts, mean word length,
    punctuation ratio, stopword ratio, plus a keep/flag bucket."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_words = F.size(toks)
    n_chars = F.length(F.col(text_col))
    punct = F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?]", ""))
    stop = sum([_count_word(text_col, w) for w in LANG_MARKERS["en"]])
    # try_divide: empty text has n_chars = 0 (n_words is >= 1 because
    # split('') yields ['']); a bare division would abort under ANSI mode
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars_m"),
        n_words.alias("n_words"),
        F.round((n_chars - n_words + 1) / n_words, 4).alias("avg_word_len"),
        F.round(F.try_divide(punct, n_chars), 4).alias("punct_ratio"),
        F.round(stop / n_words, 4).alias("stopword_ratio"),
        F.when(n_words < 5, "too_short")
        .when(F.try_divide(punct, n_chars) > 0.1, "punct_heavy")
        .otherwise("keep")
        .alias("quality_bucket"),
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + a BPE-ish subword proxy count
    (runs of letters, digits, or single punctuation, via regexp)."""
    ws = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1))
    return df.select(F.col(id_col), ws.alias("ws_tokens"), bpe.alias("bpe_tokens"))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Normalized content fingerprint: lowercase, strip punctuation,
    collapse whitespace, md5. Near-identical docs that differ only in
    case/punctuation/spacing collide."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", ""), r"\s+", " "
        )
    )
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint"))
