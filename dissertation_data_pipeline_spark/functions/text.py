"""String scalar functions (SURVEY §2.8 F-s1..F-s15).

All pure built-in compositions — each stays inside whole-stage codegen.
Citations are to /root/reference/ file:line for the behavior being
re-expressed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# F-s1 — build_master_corpus.py:43-49
def normalize_bill_number(col: Column | str) -> Column:
    """Upper+trim; strip a leading 2-letter state prefix (``AL HB209`` ->
    ``HB209``); collapse dotted prefixes (``H.B. 123`` -> ``HB123``);
    remove internal spaces (``HB 209`` -> ``HB209``).

    The state-prefix lookahead accepts dotted bill prefixes too
    (``AL H.B. 209`` -> ``HB209``) — a letters-with-optional-interior-
    dots pattern, not ``[A-Z]+\\.?`` which allowed at most one trailing
    dot and silently kept the state glued on (``ALHB209``)."""
    c = F.upper(F.trim(_c(col).cast("string")))
    c = F.regexp_replace(c, r"^[A-Z]{2}\s+(?=[A-Z](?:\.?[A-Z])*\.?\s*\d)", "")
    c = F.regexp_replace(c, r"\.", "")
    c = F.regexp_replace(c, r"\s+", "")
    return c


# F-s2 — legiscan_enricher.py:129-168
def bill_number_variants(col: Column | str) -> Column:
    """Ordered array of lookup variants: original (trimmed/upper),
    compact (no space/dot), spaced (``HB 209``), dotted (``H.B. 209``).
    Duplicates removed, order preserved (first occurrence wins)."""
    orig = F.upper(F.trim(_c(col).cast("string")))
    compact = normalize_bill_number(orig)
    prefix = F.regexp_extract(compact, r"^([A-Z]+)", 1)
    rest = F.regexp_extract(compact, r"^[A-Z]+(.*)$", 1)
    spaced = F.when(
        (prefix != "") & (rest != ""), F.concat_ws(" ", prefix, rest)
    ).otherwise(compact)
    dotted_prefix = F.concat(
        F.array_join(
            F.transform(F.split(prefix, ""), lambda ch: F.concat(ch, F.lit("."))),
            "",
        )
    )
    dotted = F.when(
        (prefix != "") & (rest != ""), F.concat_ws(" ", dotted_prefix, rest)
    ).otherwise(compact)
    arr = F.array(orig, compact, spaced, dotted)
    # stable dedup: keep element i iff no equal element at j < i
    return F.filter(
        arr, lambda x, i: ~F.exists(F.slice(arr, 1, i), lambda y: y == x)
    )


# F-s3 — build_master_corpus.py:52-58
def normalize_status(col: Column | str) -> Column:
    """Contains-classification of raw status strings into the 3-value
    enum Enacted | Passed | Other."""
    up = F.upper(F.coalesce(_c(col).cast("string"), F.lit("")))
    return (
        F.when(up.rlike("ENACT|CHAPTER|SIGNED|PUBLIC ACT"), F.lit("Enacted"))
        .when(up.rlike("PASS|ENROLL"), F.lit("Passed"))
        .otherwise(F.lit("Other"))
    )


#: status-code map — legiscan_collector.py:94-97
STATUS_CODE_LABELS = {
    1: "Introduced",
    2: "Engrossed",
    3: "Enrolled",
    4: "Passed",
    5: "Vetoed",
    6: "Failed",
}


# F-s4 — legiscan_collector.py:91-100
def decode_status_code(code: Column | str, progress: Column | str | None = None) -> Column:
    """Int status code -> label, with the progress-event override: any
    progress event == 8 (Chaptered) forces 'Enacted'."""
    c = _c(code).cast("int")
    out = F.lit("Unknown")
    for k in sorted(STATUS_CODE_LABELS, reverse=True):
        out = F.when(c == k, F.lit(STATUS_CODE_LABELS[k])).otherwise(out)
    if progress is not None:
        chaptered = F.exists(_c(progress), lambda p: p["event"] == 8)
        out = F.when(chaptered, F.lit("Enacted")).otherwise(out)
    return out


# F-s5 — legiscan_normalizer.py:165-169. Documented deviation: Spark's
# initcap splits on whitespace only; Python str.title() also capitalizes
# after apostrophes/hyphens. The engine defines title case as initcap.
def title_case(col: Column | str) -> Column:
    return F.initcap(_c(col))


# F-s7 — legiscan_normalizer.py:219-223
def normalize_url(col: Column | str) -> Column:
    return F.trim(_c(col).cast("string"))


# F-s9 — legiscan_enricher.py:250-252 (reference slices blindly; the
# engine only slices when the value is already a 2-letter code — full
# names should go through the dim_states broadcast join, J2).
def state_code(col: Column | str) -> Column:
    c = F.upper(F.trim(_c(col).cast("string")))
    return F.when(c.rlike("^[A-Z]{2}$"), c).otherwise(F.lit(None))


# F-s10 — text_processor.py:127, fetch_texts.py:101
def safe_filename(col: Column | str) -> Column:
    return F.regexp_replace(_c(col).cast("string"), r"[/\\ ]", "_")


# J4 / F-s11 — surrogate key: build_master_corpus.py:125,
# legiscan_normalizer.py:281-284, build_corpus.py:76, normalize_corpus.py:153
def make_bill_id(state: Column | str, bill_number: Column | str) -> Column:
    return F.concat_ws(
        "_",
        F.upper(F.trim(_c(state).cast("string"))),
        F.upper(F.trim(_c(bill_number).cast("string"))),
    )


# F-s12 — normalize_corpus.py:118-133,199-203. One named expression chain:
# HTML entities -> chars, form feeds -> newlines, collapse spaces,
# drop digit-only lines, collapse 3+ newline runs, trim.
def normalize_text_plain(col: Column | str) -> Column:
    c = _c(col).cast("string")
    # '&amp;' must decode LAST (standard entity-decode order): decoding
    # it first turns escaped entities ('&amp;lt;') into live ones
    # ('&lt;') which the later replaces then double-decode to '<'
    for ent, rep in [
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#8212;", "—"),
        ("&#8217;", "'"),
        ("&amp;", "&"),
    ]:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, r"\f", "\n")
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r"(?m)^\s*\d+\s*$", "")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    return F.trim(c)


# F-s13 — fetch_texts.py:46-53: last integer path segment of a URL.
def doc_id_from_url(col: Column | str) -> Column:
    return F.nullif(
        F.regexp_extract(_c(col).cast("string"), r"/(\d+)/?\s*$", 1), F.lit("")
    ).cast("long")


# F-s14 — normalize_corpus.py:182,225, fetch_texts.py:129
def word_count(col: Column | str) -> Column:
    c = F.trim(_c(col).cast("string"))
    return F.when(
        c.isNull() | (c == ""), F.lit(0)
    ).otherwise(F.size(F.split(c, r"\s+"))).cast("int")
