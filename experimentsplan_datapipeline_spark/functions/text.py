"""Text-analysis scalar functions for LLM-data pipelines (north-star ops).

All pure Catalyst expressions (JVM-side, codegen-friendly) — no Python UDFs —
so they survive a 100 TB scan without a serialization boundary. Each has an
exact ANSI-SQL twin used by the DuckDB oracle.
"""

from __future__ import annotations

from experimentsplan_datapipeline_spark.operators.util import (
    expr_cache as _fn_cache,
)

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic
# language identifier. Deliberately small + deterministic: the goal is a
# cheap, pushdown-friendly first-pass language filter, not a model.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to "],
    "de": [" der ", " und ", " die ", " nicht "],
    "fr": [" le ", " la ", " et ", " les "],
    "es": [" el ", " los ", " que ", " de la "],
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def token_count(text: Column | str) -> Column:
    """Whitespace token count (int)."""
    t = F.trim(_c(text))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def _marker_hits(text: Column, markers: list[str]) -> Column:
    """Count of marker substrings present (0..len(markers))."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    hits = [F.when(padded.contains(m), 1).otherwise(0) for m in markers]
    out = hits[0]
    for h in hits[1:]:
        out = out + h
    return out


def language_id(text: Column | str) -> Column:
    """Heuristic language id: language with most stopword-marker hits.

    Ties break by fixed language order (en, de, fr, es); zero hits -> 'und'
    (undetermined), mirroring dropped-row semantics as an explicit value
    rather than a silent default.
    """
    t = _c(text)
    scored = None
    best_lang = None
    for lang, markers in LANG_MARKERS.items():
        s = _marker_hits(t, markers)
        if scored is None:
            scored, best_lang = s, F.lit(lang)
        else:
            best_lang = F.when(s > scored, F.lit(lang)).otherwise(best_lang)
            scored = F.when(s > scored, s).otherwise(scored)
    return F.when(scored > 0, best_lang).otherwise(F.lit("und"))


def quality_score(text: Column | str) -> Column:
    """Cheap document quality score in [0,1].

    0.5 * length_score + 0.3 * alpha_ratio + 0.2 * space_ratio where
    length_score saturates at 500 chars. Deterministic, SQL-expressible.
    """
    t = _c(text)
    n = F.length(t).cast("double")
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", "")).cast("double")
    spaces = F.length(F.regexp_replace(t, r"[^ ]", "")).cast("double")
    safe_n = F.greatest(n, F.lit(1.0))
    return F.round(
        F.lit(0.5) * len_score + F.lit(0.3) * (alpha / safe_n) + F.lit(0.2) * (spaces / safe_n),
        6,
    )


def doc_fingerprint(text: Column | str) -> Column:
    """Deterministic content fingerprint: md5 of whitespace-normalized lowercase text.

    The exact-dedup key; same normalization on the oracle side.
    """
    t = _c(text)
    normalized = F.regexp_replace(F.lower(F.trim(t)), r"\s+", " ")
    return F.md5(normalized)


def ngrams(text: Column | str, n: int = 3) -> Column:
    """Word n-grams as an array<string> (for Jaccard / MinHash shingles).
    Column-name calls are cached (_ngrams_cached): the windowed
    transform tree costs real py4j driver time and is an immutable
    plan fragment (r14).

    The token array is bound as a LAMBDA VARIABLE (transform over a
    one-element array) before the sliding window reads it: a bare
    column expression inlines into every use site (CollapseProject +
    no subexpression elimination inside interpreted higher-order
    lambdas), so the naive form re-ran the regex SPLIT once PER GRAM —
    O(L²) character work per row across the whole MinHash/Jaccard
    family (r12 finding, same disease as winnow_fingerprints)."""
    if isinstance(text, str):
        return _ngrams_cached(text, n)
    return _ngrams_build(text, n)


@_fn_cache(maxsize=128)
def _ngrams_cached(text_col: str, n: int) -> Column:
    return _ngrams_build(F.col(text_col), n)


def _ngrams_build(text: Column, n: int) -> Column:
    toks = F.split(F.trim(text), r"\s+")
    # slide a window of n over the token array with transform+slice;
    # sequence(1, k) is descending for k<1, so guard the empty case.
    count = F.size(toks) - F.lit(n - 1)
    return F.when(count < 1, F.array().cast("array<string>")).otherwise(
        F.flatten(
            F.transform(
                F.array(toks),
                lambda tk: F.transform(
                    F.sequence(F.lit(1), F.size(tk) - F.lit(n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(tk, i, n)),
                ),
            )
        )
    )


# GPT-style pre-tokenizer classes: letter runs, digit runs, punctuation runs.
# Deliberately RE2-compatible (same semantics in Spark's Java regex and the
# DuckDB oracle) — a real BPE merges within these pre-token boundaries, so
# this count upper-bounds and tracks BPE token counts closely.
BPE_PRETOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]+"


def token_count_bpe(text: Column | str) -> Column:
    """BPE-ish token count: number of pre-token spans (letter/digit/punct
    runs). The whitespace count (token_count) underestimates code and
    punctuation-heavy text; this is the budgeting-grade estimate."""
    return F.size(F.regexp_extract_all(_c(text), F.lit(BPE_PRETOKEN_RE), 0))


# PII patterns, deliberately RE2-compatible (identical semantics in Spark's
# Java regex and DuckDB) — the redaction pass every training corpus needs.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]+-[0-9]{3}-[0-9]{4}"


def redact_pii(text: Column | str) -> Column:
    """Replace emails/phones with typed placeholders (<EMAIL>, <PHONE>).

    Single pass per pattern, pure Catalyst regexp_replace — rides the scan
    at any corpus size. Order matters: emails first so phone-like digit
    runs inside addresses are already collapsed.
    """
    t = _c(text)
    out = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def pii_counts(text: Column | str) -> tuple[Column, Column]:
    """(n_emails, n_phones) match counts — the audit side of redaction."""
    t = _c(text)
    return (
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), 0)),
    )
