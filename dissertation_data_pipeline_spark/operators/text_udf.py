"""Text-extraction UDF layer (SURVEY §2.10 U-f1..U-f7).

The only operators in the engine where Python touches row data — and
only because they wrap third-party parsers (bs4/pypdf). Everything is
Arrow-batched ``mapInPandas``; the relational work before (cheap
filters — O-m2) and after (aggregates over decisions) stays native.

Library gating: bs4 and pypdf may be absent. HTML falls back to a
regex-based stripper (real, tested logic — the reference's own
fallback at fetch_texts.py:33-35 is regex too). PDF without pypdf
falls back to a stdlib extractor (:func:`pdf_text_fallback` —
zlib-inflated Flate/uncompressed text-object streams); only PDFs
beyond that scope yield the reference's limitation sentinel
(normalize_corpus.py:209-213 records the same flag).
"""

from __future__ import annotations

import base64
import re
from collections.abc import Iterator
from html import unescape as _html_unescape

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: decision-struct schema produced per document (DECISIONS contract
#: subset; normalize_corpus.py:152-169)
EXTRACT_SCHEMA = (
    "bill_id string, original_format string, raw_text string, "
    "normalized_text string, strikethrough_detected boolean, "
    "strikethrough_chars_removed int, strikethrough_detection_method string, "
    "strikethrough_limitation_flag boolean, notes string"
)

_TAG_RE = re.compile(r"<(script|style)\b.*?</\1>", re.I | re.S)
_STRIKE_TAG_RE = re.compile(r"<(s|strike|del)\b[^>]*>.*?</\1>", re.I | re.S)
_STRIKE_CSS_RE = re.compile(
    r"<(\w+)\b[^>]*text-decoration\s*:\s*line-through[^>]*>.*?</\1>", re.I | re.S
)
_ANY_TAG_RE = re.compile(r"<[^>]+>")


def strip_strikethrough(html: str) -> tuple[str, int, str]:
    """U-f3 (normalize_corpus.py:84-115): remove <s>/<strike>/<del>
    elements and CSS line-through nodes; report chars removed and the
    detection method enum."""
    removed = 0
    methods = []
    out, n = _STRIKE_TAG_RE.subn("", html)
    if n:
        removed += len(html) - len(out)
        methods.append("html_tags_s_strike_del")
    before = out
    out, n = _STRIKE_CSS_RE.subn("", out)
    if n:
        removed += len(before) - len(out)
        methods.append("css_line_through")
    method = (
        "html_tags_and_css"
        if len(methods) == 2
        else (methods[0] if methods else "none_found")
    )
    return out, removed, method


def html_to_text(html: str) -> str:
    """U-f1 (text_processor.py:43-64): bs4 when present, regex fallback
    otherwise (drop script/style, strip tags, tidy lines).

    Canonical entity behavior: BOTH paths decode HTML entities the way
    a parser does — bs4 decodes during parsing; the fallback applies
    stdlib ``html.unescape`` after tag stripping (single pass, so
    ``&amp;#38;`` yields the literal ``&#38;``, matching bs4). Numeric
    entities therefore extract identically with or without bs4
    (``&#8217;`` -> U+2019 on both paths); convergence is pinned in
    tests/test_sources_and_udfs.py."""
    try:
        from bs4 import BeautifulSoup  # type: ignore

        soup = BeautifulSoup(html, "html.parser")
        for t in soup(["script", "style"]):
            t.decompose()
        text = soup.get_text("\n", strip=True)
    except ImportError:
        text = _TAG_RE.sub("", html)
        text = _ANY_TAG_RE.sub(" ", text)
        text = _html_unescape(text)
    lines = [ln.strip() for ln in text.splitlines()]
    return "\n".join(ln for ln in lines if ln)


#: object stream: dict .. stream\r?\n payload endstream (DOTALL; the
#: non-greedy payload stops at the first endstream — fine for the
#: simple single-stream-per-object PDFs this fallback targets).
#: At most ONE trailing EOL is stripped (the one the spec inserts
#: before `endstream`): a greedy \s* would eat trailing 0x0A/0x0D
#: bytes that belong to the Flate payload and corrupt ~1/128 streams.
_PDF_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)\r?\n?endstream", re.S)

#: content-stream text tokens: literal/hex strings shown with Tj/',
#: TJ arrays, and the line-advancing operators (newline heuristic)
_PDF_LIT = rb"\((?:\\.|[^\\()])*\)"
_PDF_HEX = rb"<[0-9A-Fa-f\s]*>"
_PDF_TOKEN_RE = re.compile(
    rb"(?P<lit>" + _PDF_LIT + rb")\s*(?:Tj|')"
    rb"|(?P<hex>" + _PDF_HEX + rb")\s*(?:Tj|')"
    rb"|\[(?P<arr>(?:" + _PDF_LIT + rb"|" + _PDF_HEX + rb"|[^\]])*)\]\s*TJ"
    rb"|(?P<nl>T\*|-?[0-9.]+\s+-?[0-9.]+\s+(?:Td|TD))"
)
_PDF_ARR_STR_RE = re.compile(_PDF_LIT + rb"|" + _PDF_HEX)

_PDF_ESCAPES = {
    ord("n"): 0x0A, ord("r"): 0x0D, ord("t"): 0x09, ord("b"): 0x08,
    ord("f"): 0x0C, ord("("): 0x28, ord(")"): 0x29, ord("\\"): 0x5C,
}


def _pdf_unescape(raw: bytes) -> str:
    """PDF literal-string body -> text: \\n-class escapes, up-to-3-digit
    octal codes, and backslash line continuations (PDF 32000-1 §7.3.4.2).
    Single-byte codes decode as Latin-1 — the identity mapping for the
    ASCII/WinAnsi text simple generators emit (no font CMaps here)."""
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i]
        if c != 0x5C:  # not a backslash
            out.append(c)
            i += 1
            continue
        i += 1
        if i >= len(raw):
            break
        e = raw[i]
        if e in _PDF_ESCAPES:
            out.append(_PDF_ESCAPES[e])
            i += 1
        elif 0x30 <= e <= 0x37:  # \ddd octal
            j, val = i, 0
            while j < len(raw) and j < i + 3 and 0x30 <= raw[j] <= 0x37:
                val = val * 8 + raw[j] - 0x30
                j += 1
            out.append(val & 0xFF)
            i = j
        elif e in (0x0A, 0x0D):  # line continuation
            i += 1
            if e == 0x0D and i < len(raw) and raw[i] == 0x0A:
                i += 1
        else:  # unknown escape: the char stands for itself
            out.append(e)
            i += 1
    return out.decode("latin-1")


def _pdf_token_text(tok: bytes) -> str:
    """One literal ``(...)`` or hex ``<...>`` string token -> text."""
    if tok[:1] == b"(":
        return _pdf_unescape(tok[1:-1])
    h = re.sub(rb"\s", b"", tok[1:-1])
    if len(h) % 2:  # odd nibble count: PDF pads with 0
        h += b"0"
    try:
        return bytes.fromhex(h.decode("ascii")).decode("latin-1")
    except ValueError:
        return ""


def pdf_text_fallback(data: bytes) -> str | None:
    """Minimal stdlib PDF text extractor (no pypdf): walk every object
    stream, inflate /FlateDecode payloads with zlib (uncompressed
    streams pass through; any other /Filter is skipped), then pull the
    text-showing operators (Tj, ', TJ arrays) out of the content,
    emitting a newline at each line-advance operator (Td/TD/T*).

    Honest scope — the same class of PDF the reference's corpus
    actually contains (text-object streams with simple single-byte
    encodings): no font CMap/ToUnicode resolution, no cross-reference
    repair, no encryption. Returns the text when at least one text
    chunk was found, else None so the caller records the reference's
    PDF-limitation sentinel (normalize_corpus.py:209-213)."""
    import zlib

    if not data or not data.startswith(b"%PDF"):
        return None
    pieces: list[str] = []
    for m in _PDF_STREAM_RE.finditer(data):
        sdict, payload = m.group(1), m.group(2)
        if b"/FlateDecode" in sdict:
            try:
                payload = zlib.decompress(payload)
            except zlib.error:
                continue
        elif b"/Filter" in sdict:
            continue  # unsupported codec (DCTDecode images etc.)
        chunk: list[str] = []
        for t in _PDF_TOKEN_RE.finditer(payload):
            if t.group("nl") is not None:
                if chunk and chunk[-1] != "\n":
                    chunk.append("\n")
            elif t.group("arr") is not None:
                chunk.extend(
                    _pdf_token_text(s.group(0))
                    for s in _PDF_ARR_STR_RE.finditer(t.group("arr"))
                )
            else:
                chunk.append(_pdf_token_text((t.group("lit") or t.group("hex"))))
        text = "".join(chunk).strip()
        if text:
            pieces.append(text)
    return "\n".join(pieces) if pieces else None


def pdf_to_text(data: bytes) -> str | None:
    """U-f2 (text_processor.py:66-80): pypdf when present, else the
    stdlib :func:`pdf_text_fallback` extractor — the engine extracts
    real text from Flate/uncompressed text-object PDFs with NO
    third-party dependency; only PDFs beyond the fallback's scope
    (exotic filters, CMap-encoded fonts) yield the limitation sentinel.

    A CORRUPT payload returns None: pypdf raises PdfReadError-class
    exceptions on truncated bytes, and an uncaught per-row exception
    inside ``mapInPandas`` fails the whole job after retries — one bad
    document must not kill a corpus extraction (the module's
    sentinel-not-crash contract)."""
    try:
        from pypdf import PdfReader  # type: ignore
        import io

        reader = PdfReader(io.BytesIO(data))
        return "\n".join((page.extract_text() or "") for page in reader.pages)
    except ImportError:
        try:
            return pdf_text_fallback(data)
        except Exception:
            return None
    except Exception:  # malformed PDF: sentinel, never a task failure
        return None


def _normalize_plain(text: str) -> str:
    """Python twin of functions.normalize_text_plain (F-s12) for use
    inside the extraction batch — the SAME transformation chain:
    '&amp;' decodes LAST (escaped entities decode once, see the engine
    twin's comment) and the final trim strips spaces only (Spark
    ``F.trim``'s semantics; ``str.strip()`` would also eat trailing
    newlines/tabs and break parity with the engine path)."""
    for ent, rep in [
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#8212;", "—"), ("&#8217;", "'"),
        ("&amp;", "&"),
    ]:
        text = text.replace(ent, rep)
    text = text.replace("\f", "\n")
    text = re.sub(r"[ \t]+", " ", text)
    text = re.sub(r"^\s*\d+\s*$", "", text, flags=re.M)
    text = re.sub(r"\n{3,}", "\n\n", text)
    return text.strip(" ")


def extract_documents(docs: DataFrame) -> DataFrame:
    """U-f5/U-f7 orchestration (normalize_corpus.py:136-231): input
    (bill_id, mime, doc_b64) -> extracted + normalized text with the
    full decision struct. One ``mapInPandas`` stage; keep cheap filters
    *before* this operator (Catalyst will not reorder across it)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                bill_id = r["bill_id"]
                mime = (r["mime"] or "").lower()
                payload = r["doc_b64"]
                if payload is None or payload == "":
                    rows.append(
                        dict(
                            bill_id=bill_id, original_format="unknown",
                            raw_text=None, normalized_text=None,
                            strikethrough_detected=False,
                            strikethrough_chars_removed=0,
                            strikethrough_detection_method="none",
                            strikethrough_limitation_flag=False,
                            notes="no_text_available",
                        )
                    )
                    continue
                try:
                    data = base64.b64decode(payload)
                except (ValueError, TypeError):  # bad padding/garbage:
                    # the no-text sentinel, never a task failure
                    rows.append(
                        dict(
                            bill_id=bill_id, original_format="unknown",
                            raw_text=None, normalized_text=None,
                            strikethrough_detected=False,
                            strikethrough_chars_removed=0,
                            strikethrough_detection_method="none",
                            strikethrough_limitation_flag=False,
                            notes="undecodable_payload",
                        )
                    )
                    continue
                if "html" in mime:
                    html = data.decode("utf-8", "replace")
                    stripped, removed, method = strip_strikethrough(html)
                    raw = html_to_text(html)
                    norm = _normalize_plain(html_to_text(stripped))
                    rows.append(
                        dict(
                            bill_id=bill_id, original_format="html",
                            raw_text=raw, normalized_text=norm,
                            strikethrough_detected=removed > 0,
                            strikethrough_chars_removed=removed,
                            strikethrough_detection_method=method,
                            strikethrough_limitation_flag=False,
                            notes=None,
                        )
                    )
                elif "pdf" in mime:
                    text = pdf_to_text(data)
                    rows.append(
                        dict(
                            bill_id=bill_id, original_format="pdf",
                            raw_text=text,
                            normalized_text=_normalize_plain(text) if text else None,
                            strikethrough_detected=False,
                            strikethrough_chars_removed=0,
                            strikethrough_detection_method="none",
                            # PDFs cannot carry strikethrough markup the
                            # pipeline can see -> limitation flag, as in
                            # the reference (normalize_corpus.py:209-213)
                            strikethrough_limitation_flag=True,
                            notes=None if text else "pdf_extraction_unavailable",
                        )
                    )
                else:
                    text = data.decode("utf-8", "replace")
                    rows.append(
                        dict(
                            bill_id=bill_id, original_format="plain_text",
                            raw_text=text, normalized_text=_normalize_plain(text),
                            strikethrough_detected=False,
                            strikethrough_chars_removed=0,
                            strikethrough_detection_method="none",
                            strikethrough_limitation_flag=False,
                            notes=None,
                        )
                    )
            yield pd.DataFrame(rows)

    return docs.select("bill_id", "mime", "doc_b64").mapInPandas(run, EXTRACT_SCHEMA)


def decisions_from_extraction(extracted: DataFrame) -> DataFrame:
    """Derive the word-count/percentage decision columns natively
    (normalize_corpus.py:182,225-229) — only the parsing itself needed
    Python."""
    from dissertation_data_pipeline_spark.functions import word_count

    raw_wc = word_count("raw_text")
    norm_wc = word_count("normalized_text")
    return extracted.select(
        "*",
        raw_wc.alias("raw_word_count"),
        norm_wc.alias("normalized_word_count"),
        F.when(
            raw_wc > 0,
            F.round((raw_wc - norm_wc) * 100.0 / raw_wc, 2),
        ).otherwise(F.lit(0.0)).alias("words_removed_pct"),
        F.current_timestamp().alias("normalization_timestamp"),
    )


def normalize_unicode_nfc(df: DataFrame, text_col: str, out_col: str) -> DataFrame:
    """Unicode NFC normalization as an Arrow-batched pandas UDF —
    the canonicalization step every text-curation pipeline runs
    before hashing, dedup, or tokenization (C4/CCNet style): without
    it, a composed "é" (U+00E9) and its decomposed twin
    (e + U+0301) hash apart and dedup misses the pair.

    stdlib ``unicodedata`` (always present — no library gate), batched
    through Arrow like the other decoders here; NULL passes through.
    Spark has no native NFC expression, so this is a genuine
    UDF-boundary per SURVEY §2.10's rule — but it is a narrow,
    shuffle-free map that fuses scan-side: at 100 TB it adds one
    Python stage per scan partition and never moves data.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda v: unicodedata.normalize("NFC", v) if v is not None else None
        )

    return df.withColumn(out_col, _nfc(F.col(text_col)))
