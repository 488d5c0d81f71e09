"""Tests for io readers/sinks, state tables, mockable REST enrichment,
text-extraction UDFs, and multimodal plumbing."""

from __future__ import annotations

import base64
import io
import os
import shutil
import tempfile
import zipfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from dissertation_data_pipeline_spark.operators import multimodal as mm
from dissertation_data_pipeline_spark.operators import text_udf
from dissertation_data_pipeline_spark.schemas import BILLS_RAW
from dissertation_data_pipeline_spark.sources import io as sio
from dissertation_data_pipeline_spark.sources import state as sstate
from dissertation_data_pipeline_spark.sources.rest import enrich_with_cache


@pytest.fixture()
def tmpd():
    d = tempfile.mkdtemp(prefix="ddp-src-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_read_csv_conforms(spark, tmpd):
    p = f"{tmpd}/bills.csv"
    with open(p, "w") as f:
        f.write("state,bill_number,title\nCO,HB1,  \nWY,SB2,Real Title\n")
    df = sio.read_csv(spark, p, BILLS_RAW)
    rows = {r["state"]: r for r in df.collect()}
    assert rows["CO"]["title"] is None  # blank -> NULL
    assert rows["CO"]["status"] is None  # missing column -> typed NULL
    assert len(df.columns) == len(BILLS_RAW.fields)


def test_read_json_zip(spark, tmpd):
    schema = StructType([StructField("bill_id", IntegerType()), StructField("state", StringType())])
    zp = f"{tmpd}/data.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("2023/bill/1.json", '{"bill_id": 1, "state": "CO"}')
        zf.writestr("2023/bill/2.json", '{"bill_id": 2, "state": "WY"}')
        zf.writestr("readme.txt", "not json")
    out = sio.read_json_zip(spark, zp, schema)
    assert {(r["bill_id"], r["state"]) for r in out.collect()} == {(1, "CO"), (2, "WY")}


def test_read_keywords_and_text_dir(spark, tmpd):
    kp = f"{tmpd}/input.txt"
    with open(kp, "w") as f:
        f.write("# comment\nschool shooting\n\nfirearm\n")
    assert sio.read_keywords(spark, kp) == ["school shooting", "firearm"]

    td = f"{tmpd}/texts"
    os.makedirs(td)
    with open(f"{td}/CO_HB1.txt", "w") as f:
        f.write("bill text")
    out = sio.read_text_dir(spark, td).collect()
    assert out[0]["filename"] == "CO_HB1.txt" and out[0]["text"] == "bill text"


def test_state_table_upsert_and_filters(spark, tmpd):
    schema = StructType(
        [StructField("key", StringType()), StructField("content_hash", StringType())]
    )
    st = sstate.StateTable(spark, f"{tmpd}/state", schema, "key")
    st.upsert(spark.createDataFrame([("a", "h1"), ("b", "h2")], schema))
    st.upsert(spark.createDataFrame([("b", "h2-new"), ("c", "h3")], schema))
    got = {r["key"]: r["content_hash"] for r in st.read().collect()}
    assert got == {"a": "h1", "b": "h2-new", "c": "h3"}

    work = spark.createDataFrame([("a", "h1"), ("b", "zzz"), ("d", "h4")], schema)
    unproc = sstate.filter_unprocessed(work, st.read(), "key")
    assert {r["key"] for r in unproc.collect()} == {"d"}
    changed = sstate.content_changed(work, st.read(), "key")
    assert {r["key"] for r in changed.collect()} == {"b", "d"}


def test_enrich_with_cache_mocked_fetch(spark, tmpd):
    def fetch(keys):
        # only the distinct *missing* keys may ever reach the fetcher
        assert set(keys) <= {"CO_HB1", "CO_MISS"}, keys
        return {k: f"fetched-{k}" for k in keys if k != "CO_MISS"}

    def fetch_forbidden(keys):
        raise AssertionError(f"fetch called on cached keys: {keys}")

    from pyspark.sql.types import BooleanType

    schema = StructType(
        [
            StructField("key", StringType()),
            StructField("value", StringType()),
            StructField("found", BooleanType()),
        ]
    )
    cache = sstate.StateTable(spark, f"{tmpd}/cache", schema, "key")
    df = spark.createDataFrame(
        [("CO_HB1", None), ("CO_HB1", ""), ("CO_MISS", None), ("CO_OK", "already")],
        "key string, title string",
    )
    out = enrich_with_cache(df, "key", "title", cache, fetch)
    got = {(r["key"], r["title"]) for r in out.collect()}
    assert ("CO_HB1", "fetched-CO_HB1") in got
    assert ("CO_OK", "already") in got
    assert ("CO_MISS", None) in got
    cached = {r["key"]: r["found"] for r in cache.read().collect()}
    assert cached == {"CO_HB1": True, "CO_MISS": False}  # negative cached too

    # second run: everything (incl. the negative) served from cache —
    # the fetcher must never fire
    out2 = enrich_with_cache(df, "key", "title", cache, fetch_forbidden)
    assert ("CO_HB1", "fetched-CO_HB1") in {(r["key"], r["title"]) for r in out2.collect()}


HTML_DOC = (
    "<html><head><style>p{}</style></head><body>"
    "<p>Keep this &amp; that</p><s>struck text</s>"
    '<span style="text-decoration: line-through">also struck</span>'
    "<script>var x;</script>123\n</body></html>"
)


def test_extract_documents_html_pdf_plain(spark):
    docs = spark.createDataFrame(
        [
            ("B1", "text/html", base64.b64encode(HTML_DOC.encode()).decode()),
            ("B2", "application/pdf", base64.b64encode(b"%PDF-1.4 fake").decode()),
            ("B3", "text/plain", base64.b64encode(b"plain  text\f42").decode()),
            ("B4", "text/plain", None),
        ],
        "bill_id string, mime string, doc_b64 string",
    )
    out = {r["bill_id"]: r for r in text_udf.decisions_from_extraction(
        text_udf.extract_documents(docs)).collect()}

    b1 = out["B1"]
    assert b1["original_format"] == "html"
    assert b1["strikethrough_detected"] and b1["strikethrough_chars_removed"] > 0
    assert b1["strikethrough_detection_method"] == "html_tags_and_css"
    assert "struck" not in b1["normalized_text"]
    assert "Keep this & that" in b1["normalized_text"]
    assert "var x" not in b1["normalized_text"]

    b2 = out["B2"]
    assert b2["original_format"] == "pdf" and b2["strikethrough_limitation_flag"]

    b3 = out["B3"]
    assert b3["normalized_text"] == "plain text"  # \f + digit-line cleanup
    assert b3["raw_word_count"] >= b3["normalized_word_count"]

    assert out["B4"]["notes"] == "no_text_available"


def test_multimodal_plumbing(spark):
    import hashlib

    payloads = [b"\xff\xd8\xff fakejpeg", b"\x89PNG\r\n fakepng", b"RIFF fakewav"]
    media = spark.createDataFrame(
        [(i, "image", "application/octet-stream", p, None) for i, p in enumerate(payloads)],
        mm.MEDIA_SCHEMA,
    )
    sniffed = {r["media_id"]: r["sniffed_mime"] for r in mm.attach_metadata(media).collect()}
    assert sniffed == {0: "image/jpeg", 1: "image/png", 2: "audio/wav"}

    feats = {r["media_id"]: r for r in mm.extract_image_features(media).collect()}
    assert len(feats) == 3
    w, h, c, luma = mm.fake_image_decoder(payloads[0])
    assert (feats[0]["width"], feats[0]["height"]) == (w, h)  # deterministic fake

    with pytest.raises(NotImplementedError):
        mm.sample_video_frames(media)
