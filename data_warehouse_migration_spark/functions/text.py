"""Text-analysis expression library (north-star extension).

Pure Column expressions over the ``documents`` table: token counting,
quality scoring, language-ID heuristic, fingerprinting. No UDFs —
these run inside codegen at scan speed, which is the difference
between "works" and "works on 100 TB of text".
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from data_warehouse_migration_spark.operators.dedup import normalized_text

# Small fixed english stopword list (deterministic; mirrored in oracles).
STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "is", "it", "for")

# BPE-ish token pattern: letter runs, digit runs, single other symbols.
TOKEN_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(normalized_text(text), " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count via the regex segmentation above —
    a deterministic stand-in for a BPE tokenizer's token count."""
    return F.size(F.regexp_extract_all(normalized_text(text), F.lit(TOKEN_PATTERN), 0))


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        hits / F.size(toks)
    )


def avg_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        total.cast("double") / F.size(toks)
    )


def quality_score(text: Column) -> Column:
    """Heuristic document quality ∈ [0,1]: rewards mid-length docs with
    a healthy stopword ratio and plausible mean token length.
    Deterministic closed form (mirrored in the DuckDB oracle)."""
    n = token_count(text)
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    sw = stopword_ratio(text)
    sw_score = F.lit(1.0) - F.abs(sw - F.lit(0.3))
    tl = avg_token_len(text)
    tl_score = F.when((tl >= 3) & (tl <= 8), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((len_score + sw_score + tl_score) / 3, 6)


#: Marker words per language for the n-gram/stopword language-ID
#: heuristic. Deterministic and intentionally tiny — language ID at
#: pipeline scale is a scoring pass, not a model inference.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "de", "es"),
    "fr": ("le", "la", "et", "est"),
    "de": ("der", "die", "und", "ist"),
    "zh": ("的", "是", "了", "在"),
}


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(text)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def predicted_lang(text: Column) -> Column:
    """argmax over language marker hit counts; ties resolve in the fixed
    key order of LANG_MARKERS (en first), zero hits → 'und'."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


# --- PII redaction (training-data scrubbing) -------------------------------
# Patterns restricted to syntax Java regex (Spark) and RE2 (DuckDB)
# interpret identically, so redacted text is byte-identical cross-engine
# (the oracle md5-hashes it).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+\d{7,15}"


def redact_pii(text: Column) -> Column:
    """Replace emails, IPv4 addresses, and +-prefixed phone numbers with
    typed placeholders. Order matters: emails first (an address can
    contain digit runs), then IPs, then phones. Pure Column
    expressions — the scrub runs inside codegen at scan speed, the only
    sane shape for a 100 TB corpus pass."""
    out = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_IPV4_RE, "<IP>")
    return F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")
