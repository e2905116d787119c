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


# BPE-ish subword pattern: letter runs | digit runs | single non-space symbol.
# Deliberately RE2-compatible (no lookaround) so Spark's Java regex and
# DuckDB's RE2 count identically.
_SUBWORD_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def subword_token_count_expr(text: Column) -> Column:
    """BPE-ish token count (the tokenizer-free budget estimate a training
    pipeline uses before the real tokenizer runs)."""
    return F.regexp_count(text, F.lit(_SUBWORD_PATTERN)).cast("int")


def subword_token_count_sql(text: str) -> str:
    return (
        f"CAST(len(regexp_extract_all({text}, '{_SUBWORD_PATTERN}')) AS INTEGER)"
    )


def winnow_fingerprints_expr(text: Column, k: int = 5) -> Column:
    """Winnowing document fingerprints (rolling-hash selection, the MOSS
    scheme): k-gram hashes → minimum per sliding window of 4 → distinct.

    Robust to local edits (unlike the whole-document md5): two documents
    sharing long substrings share fingerprints.  Gram hashes are md5-derived
    32-bit ints (portable across engines).

    The window minimum is built from two shifted ``zip_with``/``least``
    passes (min of pairs, then min of pairs-of-pairs = windows of 4) — a
    naive ``transform(sequence, i -> array_min(slice(hashes, i, 4)))``
    re-inlines the whole md5 pipeline per window (no CSE across
    higher-order-function lambdas) and is O(n²) in md5 calls.
    """
    t = F.regexp_replace(F.trim(text), r"\s+", " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(1))),
        lambda i: t.substr(i, F.lit(k)),
    )
    h = F.transform(
        grams, lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
    )
    n = F.size(h)
    safe = lambda c: F.greatest(c, F.lit(1))  # noqa: E731  (unused-branch guard)
    m1 = F.zip_with(
        F.slice(h, 1, safe(n - 1)), F.slice(h, 2, safe(n - 1)),
        lambda x, y: F.least(x, y),
    )
    m2 = F.zip_with(
        F.slice(m1, 1, safe(n - 3)), F.slice(m1, 3, safe(n - 3)),
        lambda x, y: F.least(x, y),
    )
    wins = F.when(n >= 4, m2).otherwise(F.array(F.array_min(h)))
    return F.array_sort(F.array_distinct(wins))


def winnow_hashes_sql(text: str, k: int = 5) -> str:
    """SQL expr for the k-gram hash list — materialize it as a CTE column
    before windowing (inlining it into the window comprehension recomputes
    every md5 once per window)."""
    t = f"regexp_replace(trim({text}), '\\s+', ' ', 'g')"
    grams = (
        f"[substring({t}, i, {k}) "
        f"FOR i IN range(1, GREATEST(length({t}) - {k - 1}, 1) + 1)]"
    )
    return (
        f"[CAST(CAST(('0x' || substr(md5(g), 1, 8)) AS UBIGINT) AS BIGINT) "
        f"FOR g IN {grams}]"
    )


def winnow_select_sql(hashes_col: str) -> str:
    """Window-of-4 minima + distinct + sort over a PRE-MATERIALIZED hash
    column (see :func:`winnow_hashes_sql`)."""
    return (
        f"list_sort(list_distinct(CASE WHEN len({hashes_col}) >= 4 "
        f"THEN [list_min({hashes_col}[i : i + 3]) "
        f"FOR i IN range(1, len({hashes_col}) - 2)] "
        f"ELSE [list_min({hashes_col})] END))"
    )
