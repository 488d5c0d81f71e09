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
    dot and silently kept the state glued on (``ALHB209``).

    DELIBERATE DIVERGENCE from the reference: build_master_corpus.py:46
    strips ANY leading ``[A-Z]{2}\\s+`` unconditionally, which destroys
    bill numbers whose prefix is itself two letters and space-separated
    (``'HB 12'`` -> ``'12'``). The engine strips only when what follows
    looks like a bill number (letters, optional dots, then digits), so
    ``'HB 12'`` -> ``'HB12'``. ``bill_number_variants`` applies the SAME
    guard so the two functions agree on every input; both behaviors are
    pinned in tests/test_reference_parity.py with the divergence cases
    marked expected-different."""
    c = F.upper(F.trim(_c(col).cast("string")))
    c = F.regexp_replace(c, r"^[A-Z]{2}\s+(?=[A-Z](?:\.?[A-Z])*\.?\s*\d)", "")
    c = F.regexp_replace(c, r"\.", "")
    c = F.regexp_replace(c, r"\s+", "")
    return c


# F-s2 — legiscan_enricher.py:129-168 (normalize_bill_number there
# returns the VARIANT LIST), mirrored step-for-step:
#   1. strip+upper; drop the first whitespace token iff it is exactly
#      2 uppercase letters, more tokens follow, AND the remainder looks
#      like a bill number (letters, optional dots, then digits) — the
#      same guard as normalize_bill_number (F-s1), so on prefix+number
#      inputs (the domain the Hypothesis property in
#      tests/test_properties.py generates) every emitted variant
#      re-normalizes to the F-s1 compact form. Inputs with TRAILING
#      tokens ('AB 123 extra') don't have that property under either
#      strip rule: the anchored prefix+digits match truncates the tail
#      exactly as the reference's re.match does. DELIBERATE
#      DIVERGENCE: the reference (legiscan_enricher.py:139-142) strips
#      any 2-char first token unconditionally, destroying 'HB 12' ->
#      variants of '12'; the engine keeps 'HB 12' intact. Divergence
#      cases are pinned in tests/test_reference_parity.py.
#   2. no_spaces = remove ' ' and '.'; appended iff it differs;
#   3. "PREFIX NUMBER" from re.match('([A-Z]+)(\\d+)') on no_spaces,
#      appended iff new;
#   4. dotted "P.R.E. NUMBER" only for prefixes of length >= 2,
#      appended iff new.
# Empty/NULL input -> empty array (reference returns []).
def bill_number_variants(col: Column | str) -> Column:
    s = F.upper(F.trim(_c(col).cast("string")))
    toks = F.split(s, r"\s+")
    rest = F.array_join(F.slice(toks, 2, F.size(toks) - 1), " ")
    base = F.when(
        (F.size(toks) > 1)
        & F.element_at(toks, 1).rlike("^[A-Z]{2}$")
        & rest.rlike(r"^[A-Z](\.?[A-Z])*\.?\s*\d"),
        rest,
    ).otherwise(s)
    no_spaces = F.regexp_replace(base, r"[ .]", "")
    prefix = F.regexp_extract(no_spaces, r"^([A-Z]+)(\d+)", 1)
    number = F.regexp_extract(no_spaces, r"^([A-Z]+)(\d+)", 2)
    spaced = F.concat_ws(" ", prefix, number)
    dotted = F.concat(
        F.array_join(
            F.transform(F.split(prefix, ""), lambda ch: F.concat(ch, F.lit("."))),
            "",
        ),
        F.lit(" "),
        number,
    )
    arr = F.array(
        base,
        F.when(no_spaces != base, no_spaces),
        F.when(prefix != "", spaced),
        F.when((prefix != "") & (F.length(prefix) >= 2), dotted),
    )
    arr = F.filter(arr, lambda x: x.isNotNull())
    deduped = F.filter(
        arr, lambda x, i: ~F.exists(F.slice(arr, 1, i), lambda y: y == x)
    )
    return F.when(
        s.isNull() | (s == ""), F.array().cast("array<string>")
    ).otherwise(deduped)


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


#: status-code map — legiscan_collector.py:94-97 (0 is LegiScan's
#: default for a missing status: ``bill.get('status', 0)``)
STATUS_CODE_LABELS = {
    0: "N/A",
    1: "Introduced",
    2: "Engrossed",
    3: "Enrolled",
    4: "Passed",
    5: "Vetoed",
    6: "Failed",
}


# F-s4 — legiscan_collector.py:91-100 (get_status_text): any progress
# event == 8 (Chaptered) forces 'Enacted'; otherwise the code map with
# unknown codes rendered as 'Status <n>' (the reference's
# ``status_map.get(status, f'Status {status}')``) and NULL treated as
# the reference's missing-status default 0 -> 'N/A'.
def decode_status_code(code: Column | str, progress: Column | str | None = None) -> Column:
    c = F.coalesce(_c(code).cast("int"), F.lit(0))
    out = F.concat(F.lit("Status "), c.cast("string"))
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


# F-s12 — normalize_corpus.py:118-133 (normalize_plain_text), mirrored
# step-for-step IN THE REFERENCE'S ORDER: lowercase; entity decode
# with '&amp;' FIRST (yes, that double-decodes '&amp;lt;' to '<' —
# the reference's behavior, kept for parity); ALL numeric entities
# '&#N;' to a space; form feeds -> newlines; space/tab collapse;
# 3+-newline collapse BEFORE digit-only-line blanking (order matters:
# blanked lines are NOT re-collapsed); full-whitespace strip (Python
# ``.strip()``, not space-only trim).
def normalize_text_plain(col: Column | str) -> Column:
    c = F.lower(_c(col).cast("string"))
    for ent, rep in [
        ("&amp;", "&"),
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
    ]:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, r"&#\d+;", " ")
    c = F.regexp_replace(c, r"\f", "\n")
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    c = F.regexp_replace(c, r"(?m)^\s*\d+\s*$", "")
    return F.regexp_replace(c, r"^\s+|\s+$", "")


# F-s13 — fetch_texts.py:46-53 (get_bill_id_from_url): rstrip '/',
# split on '/', scan segments RIGHT-TO-LEFT, first all-digit segment
# wins — the id can sit anywhere in the path
# ('.../text/12345/file.pdf' -> 12345), not only at the end.
# Documented deviation: the reference returns the 0 sentinel when no
# segment matches; the engine returns NULL (0 is a plausible id and
# poisons joins/aggregates).
def doc_id_from_url(col: Column | str) -> Column:
    segs = F.split(
        F.regexp_replace(_c(col).cast("string"), r"/+$", ""), r"/"
    )
    digit_segs = F.filter(segs, lambda s: s.rlike(r"^\d+$"))
    return F.when(
        F.size(digit_segs) > 0, F.element_at(digit_segs, -1)
    ).cast("long")


# F-s14 — normalize_corpus.py:182,225, fetch_texts.py:129: the
# reference counts ``len(text.split())``, which ignores leading AND
# trailing whitespace of ANY kind. ``F.trim`` strips only 0x20
# spaces, so a text ending in '\n' (virtually every document) would
# leave an empty edge token and inflate the count — strip the full
# whitespace class first.
def word_count(col: Column | str) -> Column:
    c = F.regexp_replace(_c(col).cast("string"), r"^\s+|\s+$", "")
    return F.when(
        c.isNull() | (c == ""), F.lit(0)
    ).otherwise(F.size(F.split(c, r"\s+"))).cast("int")
