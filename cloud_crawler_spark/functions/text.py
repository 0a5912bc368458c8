"""Text analysis for large-scale training-data pipelines.

Language ID (stopword-hit heuristic), quality scoring (length /
punctuation / stopword ratios), token counting (whitespace + BPE-ish
regex), and document fingerprinting. Everything here is built-in
pyspark.sql.functions — JVM-side, whole-stage-codegen friendly — so the
same logic is expressible as the ANSI-SQL oracles the driver checks.
A rolling-hash fingerprint (not SQL-expressible) ships as a pandas UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# tiny deterministic stopword inventories per language (public common words)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ich", "ein", "mit", "sie"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"],
    "es": ["el", "la", "de", "que", "los", "en", "un", "una", "por", "con"],
}

WS_SPLIT = r"\s+"
# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
BPE_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def tokens(col) -> Column:
    """Whitespace tokens, empties removed."""
    return F.filter(F.split(col, WS_SPLIT), lambda t: t != "")


def token_count(col) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col) -> Column:
    """Count of BPE-ish pre-tokens (regexp matches)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_REGEX), F.lit(0)))


def stopword_hits(col, lang: str = "en") -> Column:
    """Number of tokens that are stopwords of `lang`."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(tokens(F.lower(col)), lambda t: F.array_contains(sw, t)))


def lang_scores(col) -> dict[str, Column]:
    return {lang: stopword_hits(col, lang) for lang in STOPWORDS}


def lang_id(col) -> Column:
    """Heuristic language ID: the language with the most stopword hits
    (ties broken by lexicographically greatest code); 'und' when
    nothing hits."""
    pairs = F.array(
        *[
            F.struct(stopword_hits(col, lang).alias("hits"), F.lit(lang).alias("lang"))
            for lang in sorted(STOPWORDS)
        ]
    )
    best = F.array_max(pairs)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def punct_count(col) -> Column:
    return F.length(col) - F.length(F.regexp_replace(col, r"[.!?,;:]", ""))


def quality_features(col) -> list[Column]:
    """Deterministic quality features; counts are integers so the DuckDB
    oracle hashes identically (no float drift)."""
    n_tok = token_count(col)
    return [
        F.length(col).alias("n_chars_meas"),
        n_tok.alias("n_tokens"),
        punct_count(col).alias("n_punct"),
        stopword_hits(col, "en").alias("n_stopwords"),
        F.round(F.length(col) / F.greatest(n_tok, F.lit(1)), 4).alias("avg_token_len"),
    ]


def fingerprint(col) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text (first 16 hex chars). SQL-expressible in any engine with md5."""
    norm = F.trim(F.regexp_replace(F.lower(col), WS_SPLIT, " "))
    return F.substring(F.md5(norm), 1, 16)


# ------------------------------------------------- rolling hash (UDF path)

_B = 1000003
_MOD = (1 << 61) - 1


def rolling_hash_py(text: str, window: int = 16) -> list[int]:
    """Karp-Rabin rolling hashes over character windows — the classic
    content-defined fingerprint; pytest-only (not SQL-expressible)."""
    if text is None or len(text) < window:
        return []
    h, out = 0, []
    pw = pow(_B, window - 1, _MOD)
    for i, ch in enumerate(text):
        h = (h * _B + ord(ch)) % _MOD
        if i >= window - 1:
            out.append(h)
            h = (h - ord(text[i - window + 1]) * pw) % _MOD
    return out


@pandas_udf(T.ArrayType(T.LongType()))
def rolling_hash_udf(texts: pd.Series) -> pd.Series:
    return pd.Series([rolling_hash_py(t) for t in texts], dtype="object")
