"""Text-analysis column functions for the training-data pipeline.

These are graft additions (not in the reference, which has no string ops
beyond tag equality — reference worker.hpp:94-121): language-ID scoring,
quality scoring, token counting, document fingerprinting.  Every function is
pure ``pyspark.sql.functions`` (JVM-side) and each has a byte-identical
ANSI-SQL builder (suffix ``_sql``) so the DuckDB oracle reproduces it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny marker-word tables for the n-gram/keyword language heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " nicht "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " que ", " los "],
    "zh": ["的", "是", "了"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def token_count_expr(text: Column) -> Column:
    """Whitespace token count; '' → 0. Portable semantics (single-space split)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1
    )


def token_count_sql(text: str) -> str:
    # CAST: DuckDB length() is BIGINT while Spark's is INT — align widths
    return (
        f"CAST(CASE WHEN length(trim({text})) = 0 THEN 0 "
        f"ELSE length(trim({text})) - length(replace(trim({text}), ' ', '')) + 1 END "
        f"AS INTEGER)"
    )


def distinct_token_ratio_expr(text: Column) -> Column:
    toks = F.split(F.trim(text), " ")
    return (F.size(F.array_distinct(toks)) / F.size(toks)).cast("double")


def distinct_token_ratio_sql(text: str) -> str:
    return (
        f"(CAST(len(list_distinct(string_split(trim({text}), ' '))) AS DOUBLE) "
        f"/ len(string_split(trim({text}), ' ')))"
    )


def marker_count_expr(text: Column, marker: str) -> Column:
    """Occurrences of ``marker`` in text (replace-length trick, portable)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(marker), F.lit(""))))
        / F.lit(len(marker))
    ).cast("long")


def marker_count_sql(text: str, marker: str) -> str:
    m = marker.replace("'", "''")
    padded = f"(' ' || {text} || ' ')"
    return (
        f"CAST((length({padded}) - length(replace({padded}, '{m}', ''))) "
        f"/ {len(marker)} AS BIGINT)"
    )


def lang_score_expr(text: Column, lang: str) -> Column:
    score = F.lit(0).cast("long")
    for m in LANG_MARKERS[lang]:
        score = score + marker_count_expr(text, m)
    return score


def lang_score_sql(text: str, lang: str) -> str:
    return "(" + " + ".join(marker_count_sql(text, m) for m in LANG_MARKERS[lang]) + ")"


def stopword_ratio_expr(text: Column) -> Column:
    n = F.lit(0).cast("long")
    for w in STOPWORDS:
        n = n + marker_count_expr(text, f" {w} ")
    return (n / F.greatest(token_count_expr(text), F.lit(1))).cast("double")


def stopword_ratio_sql(text: str) -> str:
    total = "(" + " + ".join(marker_count_sql(text, f" {w} ") for w in STOPWORDS) + ")"
    return f"(CAST({total} AS DOUBLE) / GREATEST({token_count_sql(text)}, 1))"


def quality_score_expr(text: Column) -> Column:
    """Composite [0,1] quality: length band + lexical diversity + stopword presence."""
    n_tok = token_count_expr(text)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    diversity = distinct_token_ratio_expr(text)
    stop = F.least(stopword_ratio_expr(text) * 4.0, F.lit(1.0))
    return ((len_ok + diversity + stop) / F.lit(3.0)).cast("double")


def quality_score_sql(text: str) -> str:
    n_tok = token_count_sql(text)
    len_ok = f"(CASE WHEN {n_tok} BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)"
    diversity = distinct_token_ratio_sql(text)
    stop = f"LEAST({stopword_ratio_sql(text)} * 4.0, 1.0)"
    return f"CAST((({len_ok}) + ({diversity}) + ({stop})) / 3.0 AS DOUBLE)"


def fingerprint_expr(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized text."""
    return F.md5(F.regexp_replace(F.trim(text), r"\s+", " "))


def fingerprint_sql(text: str) -> str:
    return f"md5(regexp_replace(trim({text}), '\\s+', ' ', 'g'))"
