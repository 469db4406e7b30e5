"""Text-analysis operators for training-data pipelines over ``documents``.

All pure Column expressions (JVM-side, codegen'd) so every one has an exact
DuckDB oracle: token counting, quality scoring, language ID (stopword
n-gram heuristic), document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the heuristic language ID.
LANG_MARKERS = {
    "en": [" the ", " and ", " of ", " to "],
    "de": [" der ", " und ", " die ", " nicht "],
    "fr": [" le ", " la ", " et ", " les "],
    "es": [" el ", " los ", " que ", " de la "],
}


def _occurrences(col: Column, needle: str) -> Column:
    """Count non-overlapping occurrences via length arithmetic (identical
    semantics in Spark and DuckDB — used for oracle parity)."""
    return (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / len(needle)


def token_count_cols(text_col: str = "text") -> list[Column]:
    """Whitespace tokens + a BPE-ish word-piece count (letter runs, digit
    runs, and single non-space symbols all count as pieces)."""
    t = F.col(text_col)
    ws = F.size(F.split(F.trim(t), "\\s+"))
    pieces = F.regexp_count(t, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
    return [
        ws.cast("bigint").alias("n_tokens_ws"),
        pieces.cast("bigint").alias("n_pieces"),
        (F.length(t) / F.greatest(ws, F.lit(1))).alias("chars_per_token"),
    ]


def quality_cols(text_col: str = "text") -> list[Column]:
    """Heuristic quality signals: length, alpha/digit/punct/space ratios,
    mean word length, and a composite [0,1] score."""
    t = F.col(text_col)
    n = F.greatest(F.length(t), F.lit(1)).cast("double")
    alpha = F.regexp_count(t, F.lit("[A-Za-z]")) / n
    digit = F.regexp_count(t, F.lit("[0-9]")) / n
    punct = F.regexp_count(t, F.lit(r"[^\w\s]")) / n
    space = F.regexp_count(t, F.lit(r"\s")) / n
    words = F.size(F.split(F.trim(t), "\\s+"))
    mean_wlen = F.length(t) / F.greatest(words, F.lit(1))
    score = (
        F.least(F.length(t) / F.lit(500.0), F.lit(1.0)) * 0.3
        + alpha * 0.4
        + (1.0 - F.least(punct * 4.0, F.lit(1.0))) * 0.2
        + (1.0 - F.least(digit * 4.0, F.lit(1.0))) * 0.1
    )
    return [
        F.length(t).cast("bigint").alias("n_chars_m"),
        alpha.alias("alpha_ratio"),
        digit.alias("digit_ratio"),
        punct.alias("punct_ratio"),
        space.alias("space_ratio"),
        mean_wlen.alias("mean_word_len"),
        score.alias("quality_score"),
    ]


def lang_score_cols(text_col: str = "text") -> list[Column]:
    """Per-language stopword-marker scores + argmax language."""
    t = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        s = None
        for mk in markers:
            occ = _occurrences(t, mk)
            s = occ if s is None else s + occ
        scores[lang] = s.cast("double")
    # argmax with deterministic tie-break (alphabetical language order)
    langs = sorted(LANG_MARKERS)
    best = F.lit("und")
    best_score = F.lit(-1.0)
    for lang in langs:
        is_better = scores[lang] > best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, scores[lang]).otherwise(best_score)
    cols = [scores[lang].alias(f"score_{lang}") for lang in langs]
    cols.append(F.when(best_score <= 0, F.lit("und")).otherwise(best).alias("lang_pred"))
    return cols


def fingerprint_col(text_col: str = "text") -> Column:
    """Normalized content fingerprint: lowercase, collapse whitespace, md5."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return F.md5(F.trim(norm)).alias("fingerprint")


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass narrow projection with all text-analysis columns."""
    return df.select(
        F.col(id_col),
        *token_count_cols(text_col),
        *quality_cols(text_col),
        *lang_score_cols(text_col),
        fingerprint_col(text_col),
    )
