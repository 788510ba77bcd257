"""Text analysis: token counting, quality scoring, language ID,
document fingerprinting.

Every function here is a pure ``Column`` expression (whole-stage
codegen, no Python) and each has an exact ANSI-SQL twin in
``__spark_entry__.oracle_sql`` — the implementations are deliberately
restricted to constructs DuckDB evaluates identically (lower/trim/
regexp_replace/md5/split counting).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword kernels (public knowledge; enough for a
# coarse n-gram-free heuristic language ID).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "fr": ["le", "la", "les", "de", "et", "est", "dans", "que", "pour", "une"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "es": ["el", "la", "los", "de", "que", "es", "en", "por", "con", "para"],
}


def word_count(text: Column) -> Column:
    """Whitespace token count; empty/blank → 0."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND
    letter/digit/punctuation boundaries, approximating BPE token
    inflation without a vocab. Deterministic, JVM-side."""
    # inject boundaries, collapse, count
    marked = F.regexp_replace(text, r"([0-9]+|[^A-Za-z0-9\s]+)", r" $1 ")
    t = F.trim(marked)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not letter/digit/whitespace."""
    n = F.length(text)
    stripped = F.length(F.regexp_replace(text, r"[^A-Za-z0-9\s]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise((n - stripped) / n)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Stopword hits / word count (quality signal: ~0 for gibberish)."""
    pat = r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"
    hits = F.regexp_count(F.lower(text), F.lit(pat))
    wc = word_count(text)
    return F.when(wc == 0, F.lit(0.0)).otherwise(hits / wc)


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score: length, punctuation, stopwords.

    score = 0.4*min(words/100,1) + 0.3*(1-min(punct_ratio*5,1))
          + 0.3*min(stopword_ratio*4,1)
    """
    w = F.least(word_count(text) / 100.0, F.lit(1.0))
    p = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    s = F.least(stopword_ratio(text) * 4.0, F.lit(1.0))
    return F.round(0.4 * w + 0.3 * p + 0.3 * s, 4)


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts (normalized by word count)."""
    out = {}
    low = F.lower(text)
    for lang, words in LANG_STOPWORDS.items():
        pat = r"\b(" + "|".join(words) + r")\b"
        out[lang] = F.regexp_count(low, F.lit(pat))
    return out


def lang_id(text: Column) -> Column:
    """argmax language by stopword hits; 'und' when no hits at all.

    Ties break by fixed language order (en, fr, de, es) — mirrored
    exactly in the SQL oracle via a CASE cascade.
    """
    scores = lang_scores(text)
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[scores[lang] for lang in langs])
    expr = F.when(best == 0, F.lit("und"))
    for lang in langs:
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip
    non-alphanumerics, collapse whitespace."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9\s]", "")
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return t


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (md5 evaluates identically in Spark and DuckDB → exact oracle)."""
    return F.md5(normalize_text(text))


def gram_hashes(text: Column, k: int = 8) -> Column:
    """Rolling char k-gram hash array: 60-bit md5-prefix hashes (the
    SQL oracle reproduces them bit-exactly)."""
    norm = normalize_text(text)
    n_grams = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.conv(F.substring(F.md5(F.substring(norm, i, k)), 1, 15), 16, 10).cast("long"),
    )


def winnow_from_hashes(w: int = 16):
    """Winnow kernel: one minimum per sliding window of w hashes,
    deduped + sorted — as an Arrow-batched pandas UDF.

    Why not pure Column algebra: nested higher-order functions
    (transform over slice+array_min) run INTERPRETED in Spark — no
    whole-stage codegen — measured ~0.2 s/row; numpy's
    sliding_window_view does the same work in microseconds. (Also:
    never reference one big lambda expression inside another — Catalyst
    inlines and re-evaluates it per element, an O(n²) blowup.)
    """
    import numpy as np
    import pandas as pd

    def kernel(hs):
        out = []
        for h in hs:
            a = np.asarray(h, dtype=np.int64)
            if len(a) <= w:
                mins = a.min(keepdims=True)
            else:
                mins = np.lib.stride_tricks.sliding_window_view(a, w).min(axis=1)
            out.append(np.unique(mins).tolist())
        return pd.Series(out)

    # real annotation objects: `from __future__ import annotations`
    # stringifies inline hints, which pandas_udf can't resolve
    kernel.__annotations__ = {"hs": pd.Series, "return": pd.Series}
    return F.pandas_udf(kernel, "array<long>")


def with_winnow_fingerprints(
    df, text_col: str = "text", out_col: str = "fps", k: int = 8, w: int = 16
):
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    rolling k-gram hashes, one minimum per window of w — a
    position-robust signature for near-dup detection. Hashing runs
    JVM-side (md5 in codegen); the window-min sweep runs in numpy."""
    staged = df.withColumn("_gram_hashes", gram_hashes(F.col(text_col), k))
    kernel = winnow_from_hashes(w)
    return staged.withColumn(out_col, kernel(F.col("_gram_hashes"))).drop("_gram_hashes")


# ------------------------------------------------------- PII redaction

# The standard pre-training scrub (C4 / CCNet / FineWeb all ship one):
# replace emails, phone numbers, and IPv4 addresses with typed
# placeholder tokens and report per-document counts. Pure Column
# expressions (regexp_extract_all + regexp_replace, whole-stage
# codegen, zero Python); patterns restricted to syntax Java regex and
# RE2/DuckDB evaluate identically (character classes, bounded repeats,
# \b word boundaries, no backrefs, no lookarounds).

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_counts(text: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_phones, n_ips) — counts BEFORE redaction.

    Order-independent: the three patterns cannot all bite the same
    span (phone needs dashes, IPv4 is dots-and-digits only, email
    needs '@')."""
    return (
        F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL), F.lit(0))),
        F.size(F.regexp_extract_all(text, F.lit(PII_PHONE), F.lit(0))),
        F.size(F.regexp_extract_all(text, F.lit(PII_IPV4), F.lit(0))),
    )


def redact_pii(text: Column) -> Column:
    """Replace every email/phone/IPv4 with a typed placeholder.

    Email runs FIRST so the IPv4 pattern cannot bite digit runs
    inside an email's domain part after partial rewrites."""
    out = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_PHONE, "<PHONE>")
    return F.regexp_replace(out, PII_IPV4, "<IP>")
