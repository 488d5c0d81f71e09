"""Row-wise scalar parity against PYTHON PORTS of the reference.

Each `_ref_*` function below is a direct transcription of the cited
reference implementation (file:line in its docstring). The tests run
the engine's Spark expression and the port over the same curated
input battery — the tricky cases a round-6 review found diverging:
edge whitespace in word counts, lowercasing + numeric entities in
text normalization, the full amendment-signal list, mid-path doc ids,
single-digit / two-digit / case-insensitive dates, state-prefix
stripping in bill-number variants, and status codes 0 / unknown.
"""

from __future__ import annotations

import re
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.functions import arrays as fa
from dissertation_data_pipeline_spark.functions import dates as fd
from dissertation_data_pipeline_spark.functions import text as fx


def _run(spark, fn_col, values, in_type="string"):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], f"i int, v {in_type}"
    )
    rows = df.select("i", fn_col(F.col("v")).alias("out")).collect()
    return [r["out"] for r in sorted(rows, key=lambda r: r["i"])]


# -- word_count: normalize_corpus.py:182 `len(text.split())` ---------------
def _ref_word_count(text):
    return 0 if text is None else len(text.split())


WORD_TEXTS = [
    None, "", "   ", "hello world", "\nhello world\n", " a\tb\nc ",
    "one", "\n\n", "a  b", "tail\n",
]


def test_word_count_parity(spark):
    got = _run(spark, fx.word_count, WORD_TEXTS)
    assert got == [_ref_word_count(t) for t in WORD_TEXTS]


# -- normalize_text_plain: normalize_corpus.py:118-133 ---------------------
def _ref_normalize_plain_text(text):
    text = text.lower()
    text = re.sub(r"&amp;", "&", text)
    text = re.sub(r"&nbsp;", " ", text)
    text = re.sub(r"&lt;", "<", text)
    text = re.sub(r"&gt;", ">", text)
    text = re.sub(r"&#\d+;", " ", text)
    text = re.sub(r"\f", "\n", text)
    text = re.sub(r"[ \t]+", " ", text)
    text = re.sub(r"\n{3,}", "\n\n", text)
    text = re.sub(r"^\s*\d+\s*$", "", text, flags=re.MULTILINE)
    return text.strip()


NORM_TEXTS = [
    "BE IT ENACTED &amp; More",
    "A&#160;B &#8212; C",
    "x&amp;lt;y",            # reference double-decodes to '<'
    "HEAD\f\nline\n\n\n\n42\ntail  &lt;end&gt;\n",
    "1\n12\n13\n2",
    "  spaced\tout  ",
    "&nbsp;&gt;&lt;",
]


def test_normalize_text_plain_parity(spark):
    got = _run(spark, fx.normalize_text_plain, NORM_TEXTS)
    assert got == [_ref_normalize_plain_text(t) for t in NORM_TEXTS]


# -- detect_amendment: normalize_corpus.py:64-81 ---------------------------
def _ref_detect_amendment(title, raw_text):
    title_lower = str(title).lower()
    amendment_signals = [
        "amend", "amendment", "relating to", "concerning",
        "modifying", "revising", "repealing", "adding to",
    ]
    if any(signal in title_lower for signal in amendment_signals):
        return True
    text_lower = str(raw_text).lower()
    if "be it enacted" in text_lower and "amend" in text_lower[:500]:
        return True
    return False


AMEND_CASES = [
    ("Relating to school safety", "x"),
    ("Concerning firearms", "x"),
    ("Revising chapter 4", "x"),
    ("An Act", "amend " + "y" * 590 + " be it enacted"),  # clause after 500
    ("An Act", "z" * 501 + " amend ... be it enacted"),   # amend after 500
    ("Plain title", "plain text"),
    ("Repealing the act", ""),
    ("Adding to title 9", ""),
]


def test_is_amendment_parity(spark):
    df = spark.createDataFrame(
        [(i, t, x) for i, (t, x) in enumerate(AMEND_CASES)],
        "i int, t string, x string",
    )
    rows = df.select(
        "i", fa.is_amendment("t", "x").alias("out")
    ).collect()
    got = [r["out"] for r in sorted(rows, key=lambda r: r["i"])]
    assert got == [_ref_detect_amendment(t, x) for t, x in AMEND_CASES]


# -- doc id: fetch_texts.py:46-53 (engine deviates: NULL not 0) ------------
def _ref_get_bill_id_from_url(url):
    if not url:
        return 0
    parts = str(url).rstrip("/").split("/")
    for part in reversed(parts):
        if part.isdigit():
            return int(part)
    return 0


URLS = [
    "https://x.com/bills/12345/text.pdf",
    "https://legiscan.com/CO/text/HB1/id/7",
    "https://x.com/view/999/",
    "https://x.com/no/id/here",
    None,
]


def test_doc_id_from_url_parity(spark):
    got = _run(spark, fx.doc_id_from_url, URLS)
    for g, u in zip(got, URLS):
        ref = _ref_get_bill_id_from_url(u)
        assert g == (ref if ref != 0 else None)  # NULL-for-0 deviation


# -- parse_date: legiscan_normalizer.py:172-216 ----------------------------
def _ref_parse_date(date_value):
    date_str = str(date_value).strip()
    if not date_str:
        return None
    formats = [
        "%Y-%m-%d", "%m/%d/%Y", "%m/%d/%y", "%Y/%m/%d",
        "%m-%d-%Y", "%m-%d-%y", "%B %d, %Y", "%b %d, %Y",
    ]
    for fmt in formats:
        try:
            dt = datetime.strptime(date_str, fmt)
            if dt.year < 100:
                dt = dt.replace(year=dt.year + 2000)
            return dt.strftime("%Y-%m-%d")
        except ValueError:
            continue
    return None


DATES = [
    "2020-01-15", "1/15/2020", "01/15/20", "1/2/2003", "2020/1/5",
    "1-15-2020", "01/15/99", "January 15, 2020", "JANUARY 15, 2020",
    "Jan 15, 2020", "jan 15, 2020", "not a date", "", "1/2/3", "1/2/203",
]


def test_parse_date_multi_parity(spark):
    got = _run(spark, fd.parse_date_multi, DATES)
    for g, s in zip(got, DATES):
        ref = _ref_parse_date(s)
        assert (g.isoformat() if g else None) == ref, (s, g, ref)


# -- bill number compact form: build_master_corpus.py:43-49 ----------------
def _ref_normalize_bill_number(s):
    s = str(s).strip().upper()
    s = re.sub(r"^[A-Z]{2}\s+", "", s)
    s = re.sub(r"([A-Z])\.([A-Z])\.", r"\1\2", s)
    s = re.sub(r"([A-Z]+)\s+(\d+)", r"\1\2", s)
    return s.strip()


# Inputs where the engine and the reference agree byte-for-byte.
NBN_AGREE = [
    "AL HB209", "HB209", "H.B. 123", "CA AB123", " sb269-269 ",
    "hb1336", "SJR 19", "CO H.B. 42", "S1", "X123",
]

# DELIBERATE DIVERGENCES (documented in functions/text.py): the
# reference strips any leading 2-letter+space token unconditionally,
# destroying bill numbers like 'HB 12' -> '12'; the engine strips only
# when the remainder looks like a bill number. The engine also removes
# ALL dots/spaces, where the reference's pair-only dot collapse leaves
# odd-length dotted prefixes half-done ('H.J.R. 19' -> 'HJR. 19').
NBN_DIVERGE = [
    # (input, engine_expected, reference_expected)
    ("HB 12", "HB12", "12"),
    ("hb 7", "HB7", "7"),
    ("H.J.R. 19", "HJR19", "HJR. 19"),
]


def test_normalize_bill_number_parity(spark):
    got = _run(spark, fx.normalize_bill_number, NBN_AGREE)
    assert got == [_ref_normalize_bill_number(b) for b in NBN_AGREE]


def test_normalize_bill_number_pinned_divergences(spark):
    inputs = [c[0] for c in NBN_DIVERGE]
    got = _run(spark, fx.normalize_bill_number, inputs)
    for (raw, eng, ref), g in zip(NBN_DIVERGE, got):
        assert g == eng, (raw, g, eng)
        assert _ref_normalize_bill_number(raw) == ref, (raw, ref)
        assert eng != ref  # the divergence is real, not stale pins


# -- bill number variants: legiscan_enricher.py:129-168 --------------------
def _ref_bill_number_variants(bill_number):
    if not bill_number:
        return []
    bill_num = str(bill_number).strip().upper()
    parts = bill_num.split()
    if len(parts) > 1 and len(parts[0]) == 2:
        bill_num = " ".join(parts[1:])
    variations = [bill_num]
    no_spaces = bill_num.replace(" ", "").replace(".", "")
    if no_spaces != bill_num:
        variations.append(no_spaces)
    match = re.match(r"([A-Z]+)(\d+)", no_spaces)
    if match:
        with_space = f"{match.group(1)} {match.group(2)}"
        if with_space not in variations:
            variations.append(with_space)
        prefix, number = match.group(1), match.group(2)
        if len(prefix) >= 2:
            dotted = ".".join(prefix) + ". " + number
            if dotted not in variations:
                variations.append(dotted)
    return variations


BILLS = [
    "CA AB123", "HB209", "H.B. 123", "S1", "CO H.B. 42",
    "", None, "X123",
]

# Same guard divergence as normalize_bill_number (see NBN_DIVERGE): the
# reference drops ANY 2-char first token, so 'HB 12' seeds variants of
# '12' and 'AB 123 extra' seeds '123 EXTRA'; the engine keeps the
# prefix when the remainder is not letters-then-digits. On
# prefix+number inputs every variant then re-normalizes to the F-s1
# compact form (property-tested in tests/test_properties.py); inputs
# with trailing tokens lack that property under either strip rule —
# the anchored prefix+digits match truncates the tail, as below.
BILLS_DIVERGE = [
    # (input, engine_expected, reference_expected)
    ("hb 12", ["HB 12", "HB12", "H.B. 12"], ["12"]),
    ("AB 123 extra", ["AB 123 EXTRA", "AB123EXTRA", "AB 123", "A.B. 123"],
     ["123 EXTRA", "123EXTRA"]),
]


def test_bill_number_variants_parity(spark):
    got = _run(spark, fx.bill_number_variants, BILLS)
    assert got == [_ref_bill_number_variants(b) for b in BILLS]


def test_bill_number_variants_pinned_divergences(spark):
    inputs = [c[0] for c in BILLS_DIVERGE]
    got = _run(spark, fx.bill_number_variants, inputs)
    for (raw, eng, ref), g in zip(BILLS_DIVERGE, got):
        assert g == eng, (raw, g, eng)
        assert _ref_bill_number_variants(raw) == ref, (raw, ref)
        assert eng != ref


# -- status decode: legiscan_collector.py:91-100 ---------------------------
def _ref_get_status_text(status):
    status_map = {
        0: "N/A", 1: "Introduced", 2: "Engrossed", 3: "Enrolled",
        4: "Passed", 5: "Vetoed", 6: "Failed",
    }
    return status_map.get(status, f"Status {status}")


def test_decode_status_code_parity(spark):
    codes = [0, 1, 2, 3, 4, 5, 6, 7, 42, None]
    got = _run(spark, fx.decode_status_code, codes, in_type="int")
    for g, c in zip(got, codes):
        assert g == _ref_get_status_text(0 if c is None else c)


# -- theme_tags: empty pattern list matches nothing ------------------------
def test_theme_tags_empty_pattern_list_matches_nothing(spark):
    df = spark.createDataFrame([("any text",)], "t string")
    out = df.select(
        fa.theme_tags("t", {"mystery": [], "real": ["any"]}).alias("tags")
    ).collect()[0]["tags"]
    assert out == ["real"]
    empty = df.select(fa.theme_tags("t", {"m": []}).alias("tags"))
    assert empty.collect()[0]["tags"] == []
