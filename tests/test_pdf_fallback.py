"""U-f2: the stdlib PDF text extractor (pdf_text_fallback) on
synthetic single-stream PDFs — Flate-compressed and uncompressed
content streams, literal-string escapes, octal codes, hex strings,
TJ kerning arrays, and line-advance newlines. No pypdf, no skip:
these fixtures are built in-test from the PDF 32000-1 stream syntax.

Reference parity target: text_processor.py:66-80 extracts per-page
text from real PDFs; this fallback covers the same corpus class
(generated text PDFs) without any third-party dependency.
"""

from __future__ import annotations

import base64
import zlib

from dissertation_data_pipeline_spark.operators import text_udf as tu


def make_pdf(content: bytes, *, compress: bool) -> bytes:
    """A minimal one-page PDF wrapping ``content`` as the page stream."""
    if compress:
        payload = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    else:
        payload, filt = content, b""
    stream_obj = (
        b"4 0 obj\n<< " + filt + b"/Length " + str(len(payload)).encode()
        + b" >>\nstream\n" + payload + b"\nendstream\nendobj\n"
    )
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + stream_obj
        + b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )


SIMPLE = b"BT /F1 12 Tf 72 700 Td (Hello World) Tj ET"


def test_flate_stream_extracts_text():
    assert tu.pdf_text_fallback(make_pdf(SIMPLE, compress=True)) == "Hello World"


def test_uncompressed_stream_extracts_text():
    assert tu.pdf_text_fallback(make_pdf(SIMPLE, compress=False)) == "Hello World"


def test_line_advance_becomes_newline():
    content = (
        b"BT 72 700 Td (line one) Tj 0 -14 Td (line two) Tj "
        b"T* (line three) Tj ET"
    )
    out = tu.pdf_text_fallback(make_pdf(content, compress=True))
    assert out == "line one\nline two\nline three"


def test_literal_escapes_and_octal():
    content = rb"BT (paren \( pair \) slash \\ tab\there octal \101) Tj ET"
    out = tu.pdf_text_fallback(make_pdf(content, compress=True))
    assert out == "paren ( pair ) slash \\ tab\there octal A"


def test_hex_string_and_tj_array():
    content = (
        b"BT <48656C6C6F> Tj 0 -14 Td "
        b"[(ker) -120 (ned) 30 ( arr) (ay)] TJ ET"
    )
    out = tu.pdf_text_fallback(make_pdf(content, compress=True))
    assert out == "Hello\nkerned array"


def test_image_filter_skipped_text_stream_kept():
    img = (
        b"5 0 obj\n<< /Filter /DCTDecode /Length 4 >>\nstream\n"
        b"\xff\xd8\xff\xd9\nendstream\nendobj\n"
    )
    pdf = make_pdf(SIMPLE, compress=True) + img
    assert tu.pdf_text_fallback(pdf) == "Hello World"


def test_non_pdf_and_textless_return_sentinel():
    assert tu.pdf_text_fallback(b"not a pdf at all") is None
    assert tu.pdf_text_fallback(b"%PDF-1.4 no streams here") is None
    # corrupt flate payload: skipped, sentinel — never an exception
    broken = make_pdf(SIMPLE, compress=True).replace(b"stream\nx", b"stream\nZZ")
    assert tu.pdf_text_fallback(broken) is None


def test_pdf_to_text_uses_fallback_without_pypdf():
    # whichever path is active (pypdf absent in this container -> the
    # stdlib fallback), the public entry point must return the text
    assert tu.pdf_to_text(make_pdf(SIMPLE, compress=True)) == "Hello World"


def test_extract_documents_pdf_now_extracts(spark):
    """End-to-end through the mapInPandas stage: a real (synthetic)
    text PDF no longer records the limitation sentinel."""
    pdf_b64 = base64.b64encode(make_pdf(SIMPLE, compress=True)).decode()
    docs = spark.createDataFrame(
        [("B1", "application/pdf", pdf_b64)],
        "bill_id string, mime string, doc_b64 string",
    )
    row = tu.extract_documents(docs).collect()[0]
    assert row["original_format"] == "pdf"
    assert row["raw_text"] == "Hello World"
    assert not row["strikethrough_limitation_flag"] or row["notes"] is None
    assert row["notes"] is None


def test_flate_payload_ending_in_eol_bytes_survives():
    """Regression: a Flate payload whose final byte IS 0x0A must not
    lose it to the pre-endstream EOL strip (a greedy whitespace strip
    corrupts ~1/128 of compressed streams)."""
    import zlib

    # construct it deterministically: a zlib stream ENDS with the
    # adler32 of the raw input, whose low byte is s1 = (1 + byte sum)
    # mod 65521 — pick 4 printable pad bytes so the sum makes the last
    # compressed byte 0x0A
    base = SIMPLE + b" % "
    need = (10 - 1 - sum(base)) % 256
    t = need + 256 if need < 128 else need  # 4 bytes in [32,126] reach [128,504]
    q, r = divmod(t, 4)
    pad = [q + 1] * r + [q] * (4 - r)
    assert sum(pad) == t and all(32 <= b <= 126 for b in pad), pad
    content = base + bytes(pad)
    comp = zlib.compress(content)
    assert comp.endswith(b"\n"), comp[-4:]
    pdf = make_pdf(content, compress=True)
    assert tu.pdf_text_fallback(pdf) == "Hello World"
