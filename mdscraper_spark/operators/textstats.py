"""Text-analysis operators for training-data pipelines.

All JVM-side (built-in pyspark.sql.functions only — whole-stage
codegen, no Python in the hot path), each with an exact ANSI-SQL twin
so the DuckDB oracle can verify values.  Determinism notes: every
float is derived by identical IEEE operations on identical inputs in
both engines; aggregates that would be order-sensitive are avoided or
made exact (decimal) first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# token pattern shared with the SQL twin (RE2/Java-compatible subset)
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny stopword inventories for the n-gram language heuristic
LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "is", "in"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "de": ("der", "die", "und", "das", "ist", "ein"),
    "fr": ("le", "la", "les", "des", "est", "une"),
}


def _hits(col: Column, words) -> Column:
    pattern = r"\b(?:" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pattern), F.lit(0)))


def token_count_ws(col: Column) -> Column:
    """Whitespace token count (empty string -> 0)."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)) \
            .otherwise(F.size(F.split(trimmed, r"\s+")))


def token_count_bpe_ish(col: Column) -> Column:
    """BPE-ish unit count: alpha runs, digit runs, single punctuation."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_PATTERN), F.lit(0)))


def lang_guess(col: Column) -> Column:
    """Stopword-hit argmax with a fixed tie order (en>es>de>fr>und)."""
    hits = {lang: _hits(col, words) for lang, words in LANG_STOPWORDS.items()}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    for lang in reversed(("en", "es", "de", "fr")):  # earlier wins ties
        expr = F.when((best > 0) & (hits[lang] == best), F.lit(lang)) \
                .otherwise(expr)
    return expr


def quality_score(col: Column) -> Column:
    """Length/stopword/mean-word-length heuristic in [0,1], rounded to
    4 places (identical double math in the SQL twin)."""
    n_chars = F.length(col).cast("double")
    n_tokens = token_count_ws(col).cast("double")
    stop_hits = _hits(col, LANG_STOPWORDS["en"]).cast("double")
    mean_word = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    stop_score = F.least(
        F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
        * F.lit(5.0), F.lit(1.0))
    word_score = F.when((mean_word >= 3.0) & (mean_word <= 10.0), F.lit(1.0)) \
                  .otherwise(F.lit(0.5))
    return F.round((len_score + stop_score + word_score) / F.lit(3.0), 4)


def doc_fingerprint(col: Column, prefix: int = 200) -> Column:
    """Stable content fingerprint: md5 of the whitespace-normalized
    lowercase prefix."""
    norm = F.regexp_replace(F.lower(F.substring(col, 1, prefix)),
                            r"\s+", " ")
    return F.md5(F.trim(norm))


# -- SQL twins (DuckDB dialect) ----------------------------------------------

def sql_token_count_ws(col: str) -> str:
    return (f"CASE WHEN length(trim({col})) = 0 THEN 0 "
            f"ELSE len(regexp_split_to_array(trim({col}), '\\s+')) END")


def sql_token_count_bpe(col: str) -> str:
    return f"len(regexp_extract_all({col}, '{TOKEN_PATTERN}'))"


def sql_hits(col: str, words) -> str:
    pattern = r"\b(?:" + "|".join(words) + r")\b"
    return f"len(regexp_extract_all(lower({col}), '{pattern}'))"


def sql_lang_guess(col: str) -> str:
    h = {lang: sql_hits(col, words) for lang, words in LANG_STOPWORDS.items()}
    best = f"greatest({h['en']}, {h['es']}, {h['de']}, {h['fr']})"
    return (f"CASE WHEN {best} = 0 THEN 'und' "
            f"WHEN {h['en']} = {best} THEN 'en' "
            f"WHEN {h['es']} = {best} THEN 'es' "
            f"WHEN {h['de']} = {best} THEN 'de' "
            f"ELSE 'fr' END")


def sql_quality_score(col: str) -> str:
    n_chars = f"CAST(length({col}) AS DOUBLE)"
    n_tokens = f"CAST({sql_token_count_ws(col)} AS DOUBLE)"
    stop = f"CAST({sql_hits(col, LANG_STOPWORDS['en'])} AS DOUBLE)"
    mean_word = f"(CASE WHEN {n_tokens} > 0 THEN {n_chars} / {n_tokens} ELSE 0.0 END)"
    len_score = f"least({n_chars} / 500.0, 1.0)"
    stop_score = (f"least((CASE WHEN {n_tokens} > 0 THEN {stop} / {n_tokens} "
                  f"ELSE 0.0 END) * 5.0, 1.0)")
    word_score = (f"(CASE WHEN {mean_word} >= 3.0 AND {mean_word} <= 10.0 "
                  f"THEN 1.0 ELSE 0.5 END)")
    return f"round(({len_score} + {stop_score} + {word_score}) / 3.0, 4)"


def sql_doc_fingerprint(col: str, prefix: int = 200) -> str:
    return (f"md5(trim(regexp_replace(lower(substr({col}, 1, {prefix})), "
            f"'\\s+', ' ', 'g')))")
