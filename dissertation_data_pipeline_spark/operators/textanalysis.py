"""[EXT] Text-analysis operators for corpus curation (north-star ops).

Everything here is a pure column expression — language ID, quality
scoring, token counting, and fingerprinting all run inside whole-stage
codegen with zero Python in the data path. At 100 TB these are the
cheap per-row passes that gate the expensive ones (dedup joins, model
scoring); they must be scan-speed, and as expressions they are.

The absent ``classify_co_pilot.py`` script of the reference produced
per-document binary strategy columns (SURVEY §2.10 *(inferred)*); these
operators are the same shape — document in, typed feature columns out.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _tokens(col: Column | str) -> Column:
    return F.split(F.lower(F.trim(_c(col).cast("string"))), r"\s+")


#: tiny per-language stopword profiles (n-gram-heuristic langid). Real
#: deployments swap in fastText/CLD3 via a pandas UDF; the *operator
#: contract* (text -> scores -> argmax with fixed tie order) is what the
#: engine defines.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "nicht", "ist", "ich", "ein"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una"),
    "fr": ("le", "la", "de", "et", "un", "une", "est", "que"),
}

#: fixed evaluation order — first language wins score ties
LANG_ORDER: tuple[str, ...] = ("en", "de", "es", "fr")


def lang_scores(col: Column | str, profiles: Mapping[str, Sequence[str]] = LANG_PROFILES) -> dict[str, Column]:
    """Per-language score: count of profile stopwords present in the
    distinct token set."""
    toks = F.array_distinct(_tokens(col))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in profiles.items()
    }


def lang_id(col: Column | str, order: Sequence[str] = LANG_ORDER) -> Column:
    """Predicted language: argmax of profile scores; ties go to the
    earliest language in ``order`` (deterministic)."""
    scores = lang_scores(col)
    expr = None
    for i, lang in enumerate(order):
        cond = None
        for other in order[i + 1 :]:
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        branch = F.lit(lang)
        if expr is None:
            expr = F.when(cond, branch) if cond is not None else branch
        else:
            expr = expr.when(cond, branch) if cond is not None else expr.otherwise(branch)
    return expr


#: English stopwords for the quality heuristic
_QUALITY_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for")


def quality_features(col: Column | str) -> dict[str, Column]:
    """Length / punctuation / stopword / digit features — the standard
    cheap quality gates of an LLM data pipeline (C4/Gopher-style)."""
    s = F.coalesce(_c(col).cast("string"), F.lit(""))
    toks = _tokens(col)
    n_chars = F.length(s)
    n_words = F.when(F.trim(s) == "", F.lit(0)).otherwise(F.size(toks))
    n_punct = F.length(F.regexp_replace(s, r"[A-Za-z0-9\s]", ""))
    n_digit = F.length(F.regexp_replace(s, r"[^0-9]", ""))
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*_QUALITY_STOPWORDS))
    )
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    safe_words = F.greatest(n_words, F.lit(1)).cast("double")
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "avg_word_len": F.round((n_chars - (n_words - 1)) / safe_words, 6),
        "punct_ratio": F.round(n_punct / safe_chars, 6),
        "digit_ratio": F.round(n_digit / safe_chars, 6),
        "stopword_ratio": F.round(n_stop / safe_words, 6),
    }


def quality_score(col: Column | str) -> Column:
    """Scalar quality score in [0, 1]: rewards stopword presence and
    mid-length documents, penalizes punctuation/digit noise.

    The weighted combination runs in integer micro-units (1e-7): the
    published ratios (6-decimal) become integers, weights 0.4/0.3/0.2/
    0.1 become 4/3/2/1, and only the final value divides by 1e7. Every
    intermediate is exact in int64, so the score is bit-identical in
    any engine — double or decimal arithmetic here lands exactly on
    rounding boundaries where engines legitimately disagree."""
    f = quality_features(col)
    million = F.lit(1_000_000).cast("long")

    def micro(ratio6: Column) -> Column:
        # rounded-6 ratio -> integer micro units (the *1e6 double is
        # integral-valued, never on a rounding boundary)
        return F.round(ratio6 * 1e6, 0).cast("long")

    lt = F.least(f["n_words"].cast("long") * 10_000, million)
    st = F.least(micro(f["stopword_ratio"]) * 5, million)
    pt = million - F.least(micro(f["punct_ratio"]) * 10, million)
    dt = million - F.least(micro(f["digit_ratio"]) * 10, million)
    score_e7 = lt * 4 + st * 3 + pt * 2 + dt * 1
    return (score_e7.cast("double") / F.lit(1e7)).alias("quality")


#: BPE-ish pre-tokenization: alnum runs or single non-space symbols —
#: a portable stand-in for a real BPE vocab merge pass.
BPE_ISH_PATTERN = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"


def token_counts(col: Column | str) -> dict[str, Column]:
    s = F.coalesce(_c(col).cast("string"), F.lit(""))
    ws = F.when(F.trim(s) == "", F.lit(0)).otherwise(F.size(_tokens(col)))
    return {
        "ws_tokens": ws.cast("int"),
        "bpe_ish_tokens": F.regexp_count(s, F.lit(BPE_ISH_PATTERN)).cast("int"),
    }


#: rolling-hash modulus (fits acc*31+cp safely in int64)
FINGERPRINT_MOD = 1_000_000_007


def doc_fingerprint(col: Column | str) -> Column:
    """Order-sensitive polynomial rolling hash over characters
    (acc*31 + codepoint, mod 1e9+7) — a compact content fingerprint
    that, unlike the md5 digests, supports incremental/windowed
    computation. Strict left fold -> engine-reproducible."""
    chars = F.split(F.coalesce(_c(col).cast("string"), F.lit("")), "")
    return F.aggregate(
        F.filter(chars, lambda ch: ch != ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % FINGERPRINT_MOD,
    )


#: PII regex patterns, ordered — redaction applies them in this order.
#: Written in the Java-regex/RE2 common subset (no lookaround, no
#: backrefs) so the same pattern string runs on Spark and any oracle.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("url", r"https?://[^\s]+"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
)


def redact(
    col: Column | str,
    *,
    terms: Sequence[str] = ("customer", "vector"),
) -> dict[str, Column]:
    """Redaction pass for corpus cleaning: structured-PII regexes
    (email/url/phone -> ``[PII:<kind>]``) then a dictionary term list
    (-> ``[TERM]``). Returns per-kind match counts plus the redacted
    text — all pure codegen expressions (``regexp_count`` /
    ``regexp_replace``), scan-speed at 100 TB like every operator in
    this module. Term matching is whole-word on the raw text; counts
    are taken *before* redaction so they report original occurrences.

    Reference analog: the reference strips markup noise from bill text
    (/root/reference/scripts/legislation/text_processor.py:43-80);
    this is the same rewrite-in-place shape for privacy scrubbing.
    """
    c = _c(col).cast("string")
    out: dict[str, Column] = {}
    red = c
    for kind, pat in PII_PATTERNS:
        out[f"n_{kind}"] = F.regexp_count(c, F.lit(pat)).cast("long")
        red = F.regexp_replace(red, pat, f"[PII:{kind}]")
    # terms are LITERAL dictionary words, not patterns: escape them, or
    # a term like "c++" becomes a quantifier (matching bare "c") and
    # "a(b" is a PatternSyntaxException at run time. Whole-word
    # anchoring uses explicit lookarounds, not \b: \b is defined
    # relative to word chars, so it silently fails at a term EDGE that
    # is itself a non-word char ("c++" followed by a space never
    # matches \b there). For word-only terms the two are equivalent —
    # the DuckDB oracle (RE2: no lookbehind) keeps \b for its
    # word-only term list.
    import re

    term_pat = (
        r"(?<![A-Za-z0-9_])("
        + "|".join(re.escape(t) for t in terms)
        + r")(?![A-Za-z0-9_])"
    )
    out["n_terms"] = F.regexp_count(c, F.lit(term_pat)).cast("long")
    out["redacted"] = F.regexp_replace(red, term_pat, "[TERM]")
    return out
