"""Text-extraction UDF layer (SURVEY §2.10 U-f1..U-f7).

The only operators in the engine where Python touches row data — and
only because they wrap third-party parsers (bs4/pypdf). Everything is
Arrow-batched ``mapInPandas``; the relational work before (cheap
filters — O-m2) and after (aggregates over decisions) stays native.

Library gating: bs4 and pypdf may be absent. HTML falls back to a
regex-based stripper (real, tested logic — the reference's own
fallback at fetch_texts.py:33-35 is regex too). PDF without pypdf
yields the reference's limitation sentinel rather than failing the
job (normalize_corpus.py:209-213 records the same flag).
"""

from __future__ import annotations

import base64
import re
from collections.abc import Iterator

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
    otherwise (drop script/style, strip tags, tidy lines)."""
    try:
        from bs4 import BeautifulSoup  # type: ignore

        soup = BeautifulSoup(html, "html.parser")
        for t in soup(["script", "style"]):
            t.decompose()
        text = soup.get_text("\n", strip=True)
    except ImportError:
        text = _TAG_RE.sub("", html)
        text = _ANY_TAG_RE.sub(" ", text)
    lines = [ln.strip() for ln in text.splitlines()]
    return "\n".join(ln for ln in lines if ln)


def pdf_to_text(data: bytes) -> str | None:
    """U-f2 (text_processor.py:66-80): pypdf when present, else None —
    the caller records the reference's PDF-limitation sentinel.

    A CORRUPT payload also returns None (recorded with the same
    sentinel): pypdf raises PdfReadError-class exceptions on truncated
    bytes, and an uncaught per-row exception inside ``mapInPandas``
    fails the whole job after retries — one bad document must not kill
    a corpus extraction (the module's sentinel-not-crash contract)."""
    try:
        from pypdf import PdfReader  # type: ignore
        import io

        reader = PdfReader(io.BytesIO(data))
        return "\n".join((page.extract_text() or "") for page in reader.pages)
    except ImportError:
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
