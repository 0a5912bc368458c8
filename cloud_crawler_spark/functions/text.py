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
from pyspark.sql import Column, Window
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


def repetition_metrics(df, text_col: str = "text", id_col: str = "doc_id",
                       max_dup_frac: float = 0.2):
    """Gopher-style repetition removal signals over word 2-grams
    (Rae et al. 2021 §A1.1 "repetition removal"): per document, the
    fraction of duplicated 2-gram occurrences and the share of the
    single most frequent 2-gram, plus the keep/drop gate.

    Scale shape: build the 2-gram array JVM-side (zip_with of two
    slices — no Python), explode_outer (a null row keeps zero-gram
    documents alive, so NO restore-join is needed), then TWO keyed
    groupBys, both with map-side partial aggregation. No join, no
    driver state, no UDF.
    """
    toks = tokens(F.lower(F.col(text_col)))
    n_pairs = F.greatest(F.size(toks) - 1, F.lit(0))
    grams = F.zip_with(
        F.slice(toks, 1, n_pairs),
        F.slice(toks, 2, n_pairs),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    per_gram = (
        df.select(F.col(id_col), F.explode_outer(grams).alias("gram"))
        .groupBy(id_col, "gram")
        .count()
    )
    real = F.col("gram").isNotNull()
    agg = per_gram.groupBy(id_col).agg(
        F.sum(F.when(real, F.col("count")).otherwise(0)).alias("_n2"),
        F.sum(F.when(real, 1).otherwise(0)).alias("_nd"),
        F.max(F.when(real, F.col("count")).otherwise(0)).alias("_top"),
    )
    nz = F.greatest(F.col("_n2"), F.lit(1))  # degenerate docs: fracs are 0/1
    dup_frac = F.round((F.col("_n2") - F.col("_nd")) / nz, 6)
    return agg.select(
        F.col(id_col),
        F.col("_n2").cast("long").alias("n_2grams"),
        dup_frac.alias("dup_2gram_frac"),
        F.round(F.col("_top") / nz, 6).alias("top_2gram_frac"),
        F.when(dup_frac <= max_dup_frac, 1).otherwise(0)
        .cast("long")
        .alias("keep_repetition"),
    )


def unit_repetition_metrics(
    df,
    unit: str = "line",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_frac: float = 0.3,
    max_dup_char_frac: float = 0.2,
):
    """Gopher §A1.1's duplicate line / paragraph signals, completing
    repetition_metrics' 2-gram pass (Rae et al. 2021 Table A1): per
    document, the fraction of duplicate UNIT occurrences (every
    occurrence beyond a unit's first) and the fraction of characters
    inside those duplicate occurrences, plus the keep gate at
    dup_frac <= 0.3 / dup_char_frac <= 0.2 (the paper's line
    thresholds). ``unit`` is 'line' (split on newline) or 'paragraph'
    (split on blank-line runs); whitespace-only units are structural
    and ignored.

    Scale shape — identical to repetition_metrics: explode_outer (a
    null row keeps unit-less documents alive, no restore join), then
    TWO keyed groupBys with map-side partial aggregation; unit text
    rides the first shuffle once, only counts ride the second. No
    join, no driver state, no UDF.
    """
    sep = {"line": "\n", "paragraph": r"\n\s*\n"}[unit]
    units = F.filter(
        F.split(F.col(text_col), sep), lambda u: F.trim(u) != ""
    )
    per_unit = (
        df.select(F.col(id_col), F.explode_outer(units).alias("u"))
        .groupBy(id_col, "u")
        .agg(F.count("*").alias("n"))
    )
    real = F.col("u").isNotNull()
    ulen = F.length("u")
    agg = per_unit.groupBy(id_col).agg(
        F.sum(F.when(real, F.col("n")).otherwise(0)).alias("_n"),
        F.sum(F.when(real, 1).otherwise(0)).alias("_nd"),
        F.sum(F.when(real, F.col("n") * ulen).otherwise(0))
        .alias("_chars"),
        F.sum(F.when(real, (F.col("n") - 1) * ulen).otherwise(0))
        .alias("_dchars"),
    )
    nz = F.greatest(F.col("_n"), F.lit(1)).cast("double")
    cz = F.greatest(F.col("_chars"), F.lit(1)).cast("double")
    dup_frac = F.round((F.col("_n") - F.col("_nd")) / nz, 6)
    dup_char_frac = F.round(F.col("_dchars") / cz, 6)
    return agg.select(
        F.col(id_col),
        F.col("_n").cast("long").alias(f"n_{unit}s"),
        dup_frac.alias(f"dup_{unit}_frac"),
        dup_char_frac.alias(f"dup_{unit}_char_frac"),
        F.when(
            (dup_frac <= max_dup_frac)
            & (dup_char_frac <= max_dup_char_frac),
            1,
        )
        .otherwise(0)
        .cast("long")
        .alias(f"keep_{unit}s"),
    )


# Gopher §A1.2's required-stopword inventory (Rae et al. 2021): a
# document must contain at least 2 of these to survive.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
):
    """Gopher quality filtering (Rae et al. 2021 §A1.2) — the full
    rule set next to repetition_metrics' §A1.1: keep a document only
    if (a) word count in [min_words, max_words]; (b) mean word length
    in [3, 10]; (c) hash/ellipsis symbol-to-word ratio <= 0.1;
    (d) <= 90% of lines start with a bullet ('•' or '- ');
    (e) <= 30% of lines end with an ellipsis ('…' or '...');
    (f) >= 80% of words contain an alphabetic character;
    (g) >= 2 distinct GOPHER_STOPWORDS present. Emits every metric
    plus the keep gate so callers can tune thresholds offline.

    Scale shape: the whole pass is built-in array/string algebra in
    ONE projection — whole-stage codegen, zero shuffle, no UDF, no
    explode (the repetition pass is the only Gopher signal that needs
    a groupBy). Counts of '#'/'…'/'...' are length-difference tricks
    so the same expression runs verbatim in the DuckDB oracle.
    """
    t = F.col(text_col)
    toks = tokens(t)
    lines = F.split(t, "\n")
    ltoks = F.transform(toks, lambda x: F.lower(x))
    n_words = F.size(toks)
    nz = F.greatest(n_words, F.lit(1)).cast("double")
    sum_len = F.aggregate(
        toks, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    mean_word_len = F.round(sum_len / nz, 6)
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ell1 = F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit("")))
    n_ell3 = (
        (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit(""))))
        / F.lit(3)
    ).cast("long")
    symbol_ratio = F.round((n_hash + n_ell1 + n_ell3) / nz, 6)
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_frac = F.round(
        F.size(
            F.filter(
                lines,
                lambda l: (F.substring(F.ltrim(l), 1, 1) == "•")
                | (F.substring(F.ltrim(l), 1, 2) == "- "),
            )
        )
        / n_lines,
        6,
    )
    ellipsis_frac = F.round(
        F.size(
            F.filter(
                lines,
                lambda l: F.endswith(F.rtrim(l), F.lit("…"))
                | F.endswith(F.rtrim(l), F.lit("...")),
            )
        )
        / n_lines,
        6,
    )
    alpha_frac = F.round(
        F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]"))) / nz, 6
    )
    n_stop = None
    for w in GOPHER_STOPWORDS:
        hit = F.array_contains(ltoks, w).cast("int")
        n_stop = hit if n_stop is None else n_stop + hit
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet_frac <= max_bullet_frac)
        & (ellipsis_frac <= max_ellipsis_frac)
        & (alpha_frac >= min_alpha_frac)
        & (n_stop >= min_stopwords)
    )
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        alpha_frac.alias("alpha_frac"),
        n_stop.cast("long").alias("n_stopwords"),
        keep.cast("long").alias("keep_quality"),
    )


# ------------------------------------------------- PII scrubbing

# RE2-safe patterns (no backrefs / lookaround) so the exact same regex
# runs in Spark (Java regex) and in the DuckDB oracle (RE2) with
# identical leftmost-first greedy semantics.
PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# >= 9 chars of digits/separators starting and ending on a digit; run
# AFTER email+IP scrubbing (longer dotted IPs would otherwise match)
PII_PHONE_RE = r"\+?\d[\d\-\s().]{7,}\d"

_PII_STAGES = (
    ("email", PII_EMAIL_RE, "<EMAIL>"),
    ("ip", PII_IPV4_RE, "<IP>"),
    ("phone", PII_PHONE_RE, "<PHONE>"),
)


def scrub_pii(col) -> Column:
    """Redact emails, IPv4 addresses, and phone-number-shaped digit
    runs (in that order — the order is load-bearing, see PII_PHONE_RE).
    Pure regexp_replace chain: whole-stage codegen, no Python, and
    byte-for-byte reproducible by the SQL oracle."""
    out = col
    for _, pat, tag in _PII_STAGES:
        out = F.regexp_replace(out, pat, tag)
    return out


def pii_counts(col) -> list[Column]:
    """Per-stage match counts [n_emails, n_ips, n_phones], each counted
    on the text AFTER the previous stages' redactions (mirrors what
    scrub_pii actually removes)."""
    cur = col
    counts = []
    for name, pat, tag in _PII_STAGES:
        counts.append(
            F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}s")
        )
        cur = F.regexp_replace(cur, pat, tag)
    return counts


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


# --------------------------------------------- unicode normalization

_CTRL_RE = r"[\x00-\x08\x0b-\x1f\x7f]"   # C0 controls minus \t\n, plus DEL
_WS_RUN_RE = r"[ \t]+"


def normalize_text_py(s: str | None) -> str | None:
    """Unicode NFC + control-char strip + space/tab-run collapse +
    space trim — the canonical text-normalization pass a training
    pipeline runs before tokenization/dedup (combining-sequence vs
    precomposed spellings of the same word must hash identically).
    Newlines survive (line structure feeds functions/lines.py).

    Kept byte-compatible with the DuckDB oracle formulation
    (nfc_normalize + the same regex chain; q_text_normalize), so
    normalization is engine-reproducible: strip(' ') not strip() —
    SQL trim() removes spaces only.
    """
    import re
    import unicodedata

    if s is None:
        return None
    s = unicodedata.normalize("NFC", s)
    s = re.sub(_CTRL_RE, "", s)
    s = re.sub(_WS_RUN_RE, " ", s)
    return s.strip(" ")


@pandas_udf(T.StringType())
def normalize_text_udf(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized normalize_text_py (NFC is not expressible in
    built-in Spark SQL functions — this is the one honest UDF in the
    text-cleaning chain; per-row work, zero shuffle)."""
    return texts.map(normalize_text_py, na_action="ignore")


# Unicode script ranges as LITERAL character classes (identical byte
# strings run in Java regex and the DuckDB oracle's RE2 — no \u/\x{}
# escape-dialect divergence). BMP ranges only: code-point semantics
# agree across both engines' UTF-8/UTF-16 internals.
SCRIPT_CLASSES = {
    "latin": "[A-Za-z]",
    "cyrillic": f"[{chr(0x0400)}-{chr(0x04FF)}]",
    "greek": f"[{chr(0x0370)}-{chr(0x03FF)}]",
    "cjk": f"[{chr(0x4E00)}-{chr(0x9FFF)}]",
    "arabic": f"[{chr(0x0600)}-{chr(0x06FF)}]",
    "hangul": f"[{chr(0xAC00)}-{chr(0xD7AF)}]",
}
WS_CLASS = r"[ \t\n\r]"


def script_profile(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_script_frac: float = 0.05,
):
    """Per-document Unicode-script mix — the homoglyph/keyword-spam
    signal (Cyrillic letters salted into Latin text, CJK link farms
    appended to English pages) and the sanity check on the stopword
    language-ID: per script in SCRIPT_CLASSES, the fraction of
    non-whitespace characters it covers, plus digit fraction,
    n_scripts (scripts above ``min_script_frac``) and the
    mixed_script flag (>= 2). Counting is length-difference over
    regexp_replace with literal-range classes — ONE codegen
    projection, zero shuffle, no UDF, and the exact same patterns run
    in the DuckDB oracle (with its explicit 'g' flag)."""
    t = F.col(text_col)

    def n_of(pat):
        return F.length(t) - F.length(F.regexp_replace(t, pat, ""))

    base = F.greatest(n_of(r"[^ \t\n\r]"), F.lit(1)).cast("double")
    cols = [F.col(id_col),
            n_of(r"[^ \t\n\r]").cast("long").alias("n_chars")]
    fracs = {}
    for name, pat in SCRIPT_CLASSES.items():
        fracs[name] = F.round(n_of(pat) / base, 6)
        cols.append(fracs[name].alias(f"frac_{name}"))
    cols.append(F.round(n_of("[0-9]") / base, 6).alias("frac_digit"))
    n_scripts = None
    for name in SCRIPT_CLASSES:
        hit = (fracs[name] >= min_script_frac).cast("int")
        n_scripts = hit if n_scripts is None else n_scripts + hit
    cols.append(n_scripts.cast("long").alias("n_scripts"))
    cols.append((n_scripts >= 2).cast("long").alias("mixed_script"))
    return df.select(*cols)


def char_entropy(df, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document character-level Shannon entropy in nats —
    H = ln(N) - sum(c*ln(c))/N over character counts c. Low entropy
    flags keyboard-mash / repeated-char / template gibberish that
    word-level heuristics miss; very high entropy flags base64/hex
    blobs masquerading as text. Scale shape: explode characters (the
    only way to see the distribution), then TWO keyed map-side-
    combinable groupBys — character text shuffles once, counts only
    after; explode_outer keeps empty docs alive with entropy 0."""
    chars = F.filter(F.split(F.col(text_col), ""), lambda c: c != "")
    per = (
        df.select(F.col(id_col), F.explode_outer(chars).alias("ch"))
        .groupBy(id_col, "ch")
        .agg(F.count("*").alias("c"))
    )
    real = F.col("ch").isNotNull()
    agg = per.groupBy(id_col).agg(
        F.sum(F.when(real, F.col("c")).otherwise(0)).alias("_n"),
        F.sum(
            F.when(real, F.col("c") * F.log(F.col("c"))).otherwise(0.0)
        ).alias("_clogc"),
    )
    nz = F.greatest(F.col("_n"), F.lit(1)).cast("double")
    h = F.when(
        F.col("_n") > 0, F.log(nz) - F.col("_clogc") / nz
    ).otherwise(F.lit(0.0))
    return agg.select(
        F.col(id_col),
        F.col("_n").cast("long").alias("n_chars"),
        F.round(h, 6).alias("entropy_nats"),
    )


# ----------------------------------------------------------------------
# Readability (Flesch) — classic quality signal for LM-corpus curation
# ----------------------------------------------------------------------

# Flesch/Flesch-Kincaid constants (Kincaid et al. 1975, public formulas)
_FLESCH_BASE, _FLESCH_WPS, _FLESCH_SPW = 206.835, 1.015, 84.6
_FK_WPS, _FK_SPW, _FK_BASE = 0.39, 11.8, 15.59

SYLLABLE_RUNS = "[aeiouy]+"
SENTENCE_RUNS = "[.!?]+"


def readability(df, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document Flesch reading-ease and Flesch-Kincaid grade with
    the standard large-corpus heuristics: words = whitespace tokens,
    sentences = runs of terminal punctuation ([.!?]+, min 1),
    syllables = vowel-group runs ([aeiouy]+) in the lowercased text.
    Used as a curation signal (drop reading-ease outliers: word-salad
    scores very low, alphabet-soup very high).

    Scale shape: ONE codegen projection — regexp_extract_all counts,
    no explode, no shuffle, no UDF — and every count is an integer, so
    the DuckDB oracle reproduces the two float formulas bit-for-bit
    after round(…, 6).
    """
    t = F.col(text_col)
    n_words = token_count(t)
    n_sents = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit(SENTENCE_RUNS), F.lit(0))),
        F.lit(1),
    )
    n_syll = F.size(
        F.regexp_extract_all(F.lower(t), F.lit(SYLLABLE_RUNS), F.lit(0))
    )
    wps = n_words / F.greatest(n_sents, F.lit(1)).cast("double")
    spw = n_syll / F.greatest(n_words, F.lit(1)).cast("double")
    flesch = F.lit(_FLESCH_BASE) - F.lit(_FLESCH_WPS) * wps \
        - F.lit(_FLESCH_SPW) * spw
    fk = F.lit(_FK_WPS) * wps + F.lit(_FK_SPW) * spw - F.lit(_FK_BASE)
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        n_sents.cast("long").alias("n_sentences"),
        n_syll.cast("long").alias("n_syllables"),
        F.round(flesch, 6).alias("flesch_ease"),
        F.round(fk, 6).alias("fk_grade"),
    )


# ----------------------------------------------------------------------
# Character-trigram language ID — the n-gram twin of the stopword lang_id
# ----------------------------------------------------------------------

# Salient trigram signatures per language (classic n-gram profiles:
# Cavnar & Trenkle 1994 top-ranked trigrams, public knowledge). Chosen
# to be pairwise-distinctive; counting is substring occurrences, so the
# signal survives missing word boundaries (where stopword-ID fails).
LANG_TRIGRAMS = {
    "en": ["the", "he ", " th", "ing", "and", "ion", " of"],
    "de": ["der", "ein", "ich", "sch", "und", "cht", "die"],
    "fr": [" de", "les", "ent", "que", "ait", "eur", "ois"],
    "es": ["los", "ado", "nte", "con", "ción", " de", "una"],
}


def trigram_hits(col, lang: str) -> Column:
    """Total occurrences of `lang`'s signature trigrams in the
    lowercased text — length-difference over literal replace(), one
    codegen expression per trigram, no regex, no UDF."""
    t = F.lower(col)
    total = F.lit(0)
    for tri in LANG_TRIGRAMS[lang]:
        cnt = (F.length(t) - F.length(F.replace(t, F.lit(tri), F.lit("")))) \
            / F.lit(len(tri))
        total = total + cnt.cast("long")
    return total


def lang_id_trigram(col) -> Column:
    """Character-trigram language ID: the language whose signature
    trigrams occur most often (ties broken by lexicographically
    greatest code, matching lang_id); 'und' when nothing hits."""
    pairs = F.array(
        *[
            F.struct(trigram_hits(col, lang).alias("hits"),
                     F.lit(lang).alias("lang"))
            for lang in sorted(LANG_TRIGRAMS)
        ]
    )
    best = F.array_max(pairs)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


# ----------------------------------------------------------------------
# Corpus-level distribution diagnostics
# ----------------------------------------------------------------------


def zipf_fit(df, text_col: str = "text", top_n: int = 200):
    """Least-squares fit of ln(freq) ~ ln(rank) over the corpus's top_n
    token frequencies — the Zipf slope (healthy natural-language
    corpora sit near -1; template/boilerplate-heavy corpora flatten,
    gibberish steepens). Returns ONE row: zipf_slope, zipf_intercept
    (both round 6), n_ranks, n_types, n_tokens.

    Scale shape: one token groupBy (map-side combinable), a top_n
    window over the count-sorted vocabulary (top_n rows — tiny), then
    a single closed-form aggregation (explicit normal-equation sums,
    the same arithmetic the DuckDB oracle runs). No UDF, no collect.
    """
    toks = df.select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    )
    freq = toks.groupBy("token").agg(F.count("*").alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    ranked = freq.select(
        F.row_number().over(w).alias("r"), F.col("n")
    ).where(F.col("r") <= top_n)
    totals = freq.agg(
        F.count("*").alias("n_types"), F.sum("n").alias("n_tokens")
    )
    x = F.log(F.col("r").cast("double"))
    y = F.log(F.col("n").cast("double"))
    s = ranked.agg(
        F.count("*").cast("double").alias("k"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"), F.sum(x * x).alias("sxx"),
    )
    slope = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    icept = (F.col("sy") - slope * F.col("sx")) / F.col("k")
    return s.crossJoin(totals).select(
        F.round(slope, 6).alias("zipf_slope"),
        F.round(icept, 6).alias("zipf_intercept"),
        F.col("k").cast("long").alias("n_ranks"),
        F.col("n_types").cast("long").alias("n_types"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )


def top_ngrams(df, n: int = 2, k: int = 50, text_col: str = "text"):
    """Corpus-wide top-k word n-grams with counts and dense rank —
    the n-gram frequency table behind LM-data analysis (boilerplate
    phrase detection, contamination probes, tokenizer sanity checks).
    Deterministic order: count desc, gram asc.

    Scale shape: n-gram arrays built JVM-side (zip_with over shifted
    slices, the repetition_metrics construction), ONE map-side-
    combinable groupBy, then a top-k window over the (already tiny
    after aggregation) frequency table. For 100 TB the window's single
    partition only ever sees the aggregated vocabulary, not documents;
    a pre-filter on count > 1 would bound it further if needed.
    """
    toks = tokens(F.lower(F.col(text_col)))
    grams = F.slice(toks, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    for i in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, 1 + i,
                    F.greatest(F.size(toks) - (n - 1), F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    freq = (
        df.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("gram").asc())
    return freq.select(
        "gram", F.col("n").cast("long").alias("n"),
        F.row_number().over(w).alias("rank")
    ).where(F.col("rank") <= k)


def host_concentration(df, host_col: str = "host", weight_col=None):
    """Corpus diversity scorecard over hosts: ONE row with n_hosts,
    top-1/top-5 share, Herfindahl-Hirschman index (sum of squared
    shares) and Shannon entropy of the host distribution — the
    standard report a curation pipeline runs before fixing mixture
    weights (a corpus dominated by three hosts is a deduplication
    problem waiting to happen).

    Scale shape: one keyed groupBy to per-host weights, then a single
    global aggregation over hosts (already tiny); the top-k shares
    come from a window over the per-host table. No UDF, no collect.
    """
    wcol = F.count("*") if weight_col is None else F.sum(weight_col)
    hosts = df.groupBy(host_col).agg(wcol.cast("double").alias("w"))
    tot = hosts.agg(F.sum("w").alias("tw"))
    shared = hosts.crossJoin(tot).select(
        (F.col("w") / F.col("tw")).alias("s")
    )
    rw = Window.orderBy(F.col("s").desc())
    ranked = shared.withColumn("r", F.row_number().over(rw))
    return ranked.agg(
        F.count("*").cast("long").alias("n_hosts"),
        F.round(F.max(F.when(F.col("r") == 1, F.col("s"))), 6)
        .alias("top1_share"),
        F.round(F.sum(F.when(F.col("r") <= 5, F.col("s")).otherwise(0.0)), 6)
        .alias("top5_share"),
        F.round(F.sum(F.col("s") * F.col("s")), 6).alias("hhi"),
        F.round(-F.sum(F.col("s") * F.log(F.col("s"))), 6)
        .alias("host_entropy"),
    )


# ----------------------------------------------------------------------
# Model-based quality filter: logistic-regression inference
# ----------------------------------------------------------------------

# Hand-set interpretable weights over the quality_features ratios (the
# fastText/FineWeb-Edu-style classifier gate, reduced to a linear model
# whose inference is pure codegen arithmetic). Positive signal: natural
# stopword density and moderate punctuation; negative: extreme token
# lengths (word salad / base64 blobs).
LR_QUALITY_WEIGHTS = {
    "bias": -1.5,
    "stop_ratio": 9.0,       # stopwords per token — the strongest signal
    "punct_ratio": 4.0,      # punctuation per char
    "avg_token_len": -0.15,  # penalize very long average tokens
    "log_tokens": 0.25,      # mild length prior
}


def lr_quality_score(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: dict | None = None,
    threshold: float = 0.5,
):
    """Logistic-regression quality classifier INFERENCE: score =
    sigmoid(w . x) over deterministic text ratios, keep = score >=
    threshold. The shape of every model-based corpus filter (quality,
    toxicity, educational value): train offline, ship weights, score
    the corpus in one embarrassingly-parallel pass. One codegen
    projection — ratios, one exp(), no UDF, no shuffle; the DuckDB
    oracle evaluates the identical formula (exp/ln float parity holds
    at full precision on the bench hosts, as with entropy/KL).
    """
    w = weights or LR_QUALITY_WEIGHTS
    t = F.col(text_col)
    n_tok = token_count(t).cast("double")
    stop_ratio = stopword_hits(t, "en") / F.greatest(n_tok, F.lit(1.0))
    punct_ratio = punct_count(t) / F.greatest(
        F.length(t).cast("double"), F.lit(1.0)
    )
    avg_len = F.length(t) / F.greatest(n_tok, F.lit(1.0))
    z = (
        F.lit(w["bias"])
        + F.lit(w["stop_ratio"]) * stop_ratio
        + F.lit(w["punct_ratio"]) * punct_ratio
        + F.lit(w["avg_token_len"]) * avg_len
        + F.lit(w["log_tokens"]) * F.log(F.lit(1.0) + n_tok)
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return df.select(
        F.col(id_col),
        F.round(score, 6).alias("lr_score"),
        (score >= threshold).cast("long").alias("keep_lr"),
    )


# ----------------------------------------------------------------------
# Winnowing fingerprint selection (Schleimer et al., SIGMOD 2003 — MOSS)
# ----------------------------------------------------------------------

# encode (hash asc, pos desc) as ONE BIGINT so the window min needs no
# struct ordering: key = h * POS_SPAN + (POS_SPAN - pos). Rightmost-min
# ("robust winnowing") falls out of the min() and both engines compare
# plain integers.
_WINNOW_POS_SPAN = 1 << 32


def winnow_fingerprints(
    df,
    k: int = 8,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Winnowing (Schleimer et al. 2003): hash every k-gram, slide a
    w-window over the hash sequence, select each window's minimum
    (ties -> rightmost), dedup selections. Guarantees every match of
    length >= w+k-1 shares a fingerprint while storing ~2/(w+1) of all
    hashes — the position-robust near-dup/plagiarism fingerprint that
    fixed-stride sampling can't give.

    The k-gram hash is the repo's engine-stable md5 arithmetic
    (hash_permille's conv(substr(md5,1,4)) over substring(text,p,k)),
    so the DuckDB oracle reproduces every selection exactly.

    Scale shape: positions are generated JVM-side (transform over
    sequence), exploded once; the ONLY shuffle is the per-doc window
    sort (doc_id partitioning), and only (id, pos, int hash) rows ride
    it — k-gram text never leaves the scan stage. Selection is a
    plain-BIGINT window min + distinct (map-side combinable). Output:
    (id_col, pos [1-based], fp) — the document's fingerprint set.
    """
    t = F.col(text_col)
    n_pos = F.greatest(F.length(t) - (k - 1), F.lit(0))
    h = lambda s: F.conv(F.substring(F.md5(s), 1, 4), 16, 10).cast("long")  # noqa: E731
    # sequence(1, 0) auto-DESCENDS to [1, 0] — guard docs shorter than k
    idx = F.when(n_pos >= 1, F.sequence(F.lit(1), n_pos)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx,
        lambda p: F.struct(
            p.alias("pos"),
            (
                h(F.substring(t, p, F.lit(k)))
                * F.lit(_WINNOW_POS_SPAN)
                + (F.lit(_WINNOW_POS_SPAN) - p)
            ).alias("key"),
        ),
    )
    rows = df.select(
        F.col(id_col), F.explode(grams).alias("g")
    ).select(id_col, F.col("g.pos").alias("pos"), F.col("g.key").alias("key"))
    w = (
        Window.partitionBy(id_col)
        .orderBy(F.col("pos").asc())
        .rowsBetween(-(window - 1), 0)
    )
    sel = rows.select(
        F.col(id_col),
        F.col("pos").alias("_end"),
        F.min("key").over(w).alias("_mkey"),
    ).where(F.col("_end") >= window)  # full windows only
    return (
        sel.select(
            F.col(id_col),
            (F.lit(_WINNOW_POS_SPAN) - F.col("_mkey") % _WINNOW_POS_SPAN)
            .cast("long")
            .alias("pos"),
            (F.col("_mkey") / F.lit(_WINNOW_POS_SPAN))
            .cast("long")
            .alias("fp"),
        )
        .distinct()
    )


def collocations(df, min_count: int = 5, k: int = 50,
                 text_col: str = "text"):
    """Top-k bigram collocations by pointwise mutual information —
    the classic corpus diagnostic (Church & Hanks 1990): PMI =
    ln(p(ab) / (p(a) p(b))) with p(ab) = c_ab / B (bigram census) and
    p(w) = c_w / T (unigram census). High-PMI pairs are multiword
    units ("los angeles") and template/boilerplate fossils; the
    `min_count` gate kills PMI's famous hapax bias (a 1-count bigram
    of two 1-count words maxes the score on noise).

    Returns (gram, n, pmi, rank) for the top-k by (pmi desc, gram
    asc), deterministic.

    Scale shape: bigram arrays built JVM-side (the top_ngrams
    zip_with construction), two map-side-combinable census groupBys;
    the scalar totals T and B ride 1-row broadcast crossJoins, the
    unigram joins key on single words against the (tiny, post-gate)
    surviving bigram table. The rank window only ever sees <= the
    gated collocation table.
    """
    toks = tokens(F.lower(F.col(text_col)))
    grams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    uni = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cw"))
    )
    big = (
        df.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= min_count)
    )
    tot_u = uni.agg(F.sum("cw").cast("double").alias("_t"))
    tot_b = (
        df.select(F.size(grams).alias("nb"))
        .agg(F.sum("nb").cast("double").alias("_b"))
    )
    ua = uni.select(F.col("w").alias("_wa"), F.col("cw").alias("_ca"))
    ub = uni.select(F.col("w").alias("_wb"), F.col("cw").alias("_cb"))
    scored = (
        big.withColumn("_wa", F.split("gram", " ").getItem(0))
        .withColumn("_wb", F.split("gram", " ").getItem(1))
        .join(ua, "_wa")
        .join(ub, "_wb")
        .crossJoin(F.broadcast(tot_u))
        .crossJoin(F.broadcast(tot_b))
        .select(
            "gram",
            F.col("n").cast("long").alias("n"),
            F.log(
                (F.col("n") / F.col("_b"))
                / ((F.col("_ca") / F.col("_t")) * (F.col("_cb") / F.col("_t")))
            ).alias("pmi"),
        )
    )
    w = Window.orderBy(F.col("pmi").desc(), F.col("gram").asc())
    return scored.select(
        "gram", "n", "pmi", F.row_number().over(w).cast("int").alias("rank")
    ).where(F.col("rank") <= k)


def chunk_documents(df, chunk_tokens: int = 128, overlap: int = 16,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Fixed-window document chunking with overlap — the RAG /
    long-context preprocessing pass: split each doc's token stream
    into windows of `chunk_tokens` whitespace tokens advancing by
    `chunk_tokens - overlap`, so consecutive chunks share `overlap`
    tokens and no sentence straddling a boundary is lost to both
    sides. The batch complement of sequence packing (pack_sequences
    joins short docs; this splits long ones).

    Returns (id, chunk_id [0-based], n_tokens, chunk). Zero-token
    documents yield no chunks; the final chunk may be shorter than
    `chunk_tokens` (standard; it is never empty).

    Scale shape: ONE codegen projection builds the start-offset array
    (sequence with step), one explode, slices + array_join — no
    shuffle at all, no UDF; a pure map over the corpus that
    parallelizes with the scan. Chunk counts are bounded by doc
    length, so no skew beyond the documents themselves.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokens(F.lower(F.col(text_col)))
    n = F.size(toks)
    starts = F.when(
        n > 0,
        F.sequence(F.lit(0), n - 1, F.lit(step)),
    ).otherwise(F.array().cast("array<int>"))
    exploded = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.posexplode(starts).alias("chunk_id", "_start"),
    )
    piece = F.slice(
        F.col("_toks"), F.col("_start") + 1, F.lit(chunk_tokens)
    )
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk"),
    )
