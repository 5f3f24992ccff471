"""Text-analysis functions for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

All pure column expressions (JVM-side, whole-stage codegen) — these run
over every document at corpus scale, so no Python is allowed here. Each
has a matching ANSI-SQL oracle in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword marker sets — an n-gram/stopword heuristic
# langid (fasttext-class models would be a pandas UDF; markers keep it
# JVM-side and deterministic)
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "ist", "nicht"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "que", "es", "una"),
}


def token_count(col: Column) -> Column:
    """Whitespace token count of trimmed text (0 for empty)."""
    t = F.trim(F.regexp_replace(col, r"\s+", " "))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, " ")))


def word_token_count(col: Column) -> Column:
    """BPE-ish token estimate: words and punctuation counted separately
    (regexp-extract-all of word chars | single non-space non-word)."""
    return F.size(F.regexp_extract_all(col, F.lit(r"(\w+|[^\w\s])"), 0))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    toks = F.split(F.lower(F.trim(F.regexp_replace(col, r"\s+", " "))), " ")
    markers = F.array(*[F.lit(m) for m in _LANG_MARKERS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0, 1]: mean-word-length sanity,
    alpha ratio, and non-degenerate length — the classic cheap filters
    (C4/Gopher-style) as one JVM expression."""
    n_chars = F.length(col).cast("double")
    n_tokens = token_count(col).cast("double")
    mean_word_len = n_chars / F.greatest(n_tokens, F.lit(1.0))
    alpha_chars = F.length(F.regexp_replace(col, r"[^A-Za-z]", "")).cast("double")
    alpha_ratio = alpha_chars / F.greatest(n_chars, F.lit(1.0))
    len_ok = F.when((n_tokens >= 5) & (n_tokens <= 100000), 1.0).otherwise(0.0)
    word_len_ok = F.when((mean_word_len >= 2.0) & (mean_word_len <= 12.0), 1.0).otherwise(0.0)
    return F.round((alpha_ratio + len_ok + word_len_ok) / F.lit(3.0), 6)


def lang_id(col: Column) -> Column:
    """Best marker-set language by stopword hits; 'unknown' when no
    marker appears."""
    toks = F.split(F.lower(F.trim(F.regexp_replace(col, r"\s+", " "))), " ")
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("unknown"))


def fingerprint64(col: Column, normalize: bool = True) -> Column:
    """64-bit document fingerprint: xxhash64 of normalized text — the
    cheap rolling-hash style identity for shard-local dedup indexes."""
    t = F.lower(F.trim(F.regexp_replace(col, r"\s+", " "))) if normalize else col
    return F.xxhash64(t)
