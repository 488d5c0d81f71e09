"""Array/collection scalar functions (SURVEY §2.8 F-a1..F-a4, P9).

Keyword matching and theme tagging — the reference's row-wise Python
loops re-expressed as higher-order array functions (JVM-side).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# P9 / F-a3 — text_processor.py:99-111: case-insensitive substring
# OR-match against a keyword list; returns the matched subset (ordered
# as the keyword list, the reference's iteration order). The MATCH is
# case-insensitive but the returned strings keep the caller's original
# casing — the reference appends the original keyword
# (text_processor.py:109), so 'School Shooting' must not come back
# lowercased.
def matched_keywords(text: Column | str, keywords: Sequence[str]) -> Column:
    low = F.lower(F.coalesce(_c(text).cast("string"), F.lit("")))
    kw = F.array(*[F.lit(k) for k in keywords])
    return F.filter(kw, lambda k: low.contains(F.lower(k)))


def keyword_filter_predicate(text: Column | str, keywords: Sequence[str]) -> Column:
    """P9 as a boolean: keep the row if any keyword matches."""
    return F.size(matched_keywords(text, keywords)) > 0


# F-a1 — tag_metadata.py:7-26: per-theme any-of-regex match over a text
# blob, collected into a sorted tag array.
def theme_tags(text: Column | str, theme_rules: Mapping[str, Sequence[str]]) -> Column:
    low = F.lower(F.coalesce(_c(text).cast("string"), F.lit("")))
    # a theme with NO patterns matches nothing (the reference's
    # per-pattern loop is vacuous) — '|'.join([]) == '' would rlike
    # EVERY row and tag the whole corpus on an emptied config entry
    tags = [
        F.when(low.rlike("|".join(pats)), F.lit(theme))
        for theme, pats in theme_rules.items()
        if pats
    ]
    if not tags:
        return F.array().cast("array<string>")
    return F.array_sort(F.array_compact(F.array(*tags)))


# F-a2 — tag_metadata.py:24-25: row-wise multi-column concat with
# empty-fill. Column *choice* (name contains title/summary/text) is
# driver-side — pass the chosen columns in.
def concat_text_columns(*cols: Column | str) -> Column:
    return F.concat_ws(" ", *[F.coalesce(_c(c).cast("string"), F.lit("")) for c in cols])


#: amendment signal substrings — normalize_corpus.py:69-72, the
#: reference's list VERBATIM ('amendment' is subsumed by 'amend' but
#: kept so the constant matches the citation line-for-line)
AMENDMENT_TITLE_SIGNALS = (
    "amend",
    "amendment",
    "relating to",
    "concerning",
    "modifying",
    "revising",
    "repealing",
    "adding to",
)


# F-a4 — normalize_corpus.py:64-81 (detect_amendment): title-signal OR
# ('be it enacted' ANYWHERE in the text AND 'amend' within the first
# 500 chars) — the 500-char window applies ONLY to 'amend'; enacting
# clauses routinely appear after a long preamble.
def is_amendment(title: Column | str, text: Column | str) -> Column:
    t = F.lower(F.coalesce(_c(title).cast("string"), F.lit("")))
    title_hit = F.lit(False)
    for s in AMENDMENT_TITLE_SIGNALS:
        title_hit = title_hit | t.contains(s)
    low = F.lower(F.coalesce(_c(text).cast("string"), F.lit("")))
    text_hit = low.contains("be it enacted") & F.substring(
        low, 1, 500
    ).contains("amend")
    return title_hit | text_hit
