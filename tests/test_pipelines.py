"""Pipeline-level tests on FIXTURES.md-shaped inline fixtures."""

from __future__ import annotations

from pyspark.sql import Row

from dissertation_data_pipeline_spark.plans import pipelines as P


def test_normalize_bills_fuzzy_merge(spark):
    f1 = spark.createDataFrame(
        [("CO", "HB 1336", "school safety act", "2020-01-15", "Introduced")],
        "STATE string, `Bill No` string, `bill title` string, `Last Date` string, Status string",
    )
    f2 = spark.createDataFrame(
        [("CO", "H.B. 1336", None, "01/20/2020", "Enrolled")],
        "state string, billno string, title string, last_action_date string, status string",
    )
    out = P.normalize_bills([f1, f2]).collect()
    assert len(out) == 1
    row = out[0]
    assert row["bill_id"] == "CO_HB1336"
    # latest date wins (01/20), missing title coalesce-filled from f1
    assert str(row["last_action_date"]) == "2020-01-20"
    assert row["title"] == "School Safety Act"
    assert row["status"] == "Enrolled"


def test_build_master_corpus_dedup_and_reports(spark):
    manual = spark.createDataFrame(
        [
            ("Colorado", "CO", "HB1336", "T1", None, None, 2020, "SIGNED", None),
            ("Wyoming", "WY", "SB10", "T2", None, None, 2021, "enrolled", None),
            ("US", "US", "HR1", "Fed", None, None, 2020, "PASS", None),  # filtered
        ],
        "state string, state_abbrev string, bill_number string, title string, legiscan_bill_url string, legiscan_text_url string, year int, status string, collection_method string",
    )
    api = spark.createDataFrame(
        [
            (None, "CO", "HB 1336", "T1b", None, None, 2020, "CHAPTER 12", None),
            (None, "UT", "HB99", "T3", None, None, 2022, "Introduced", None),
        ],
        manual.schema,
    )
    dim = spark.createDataFrame(
        [("Colorado", "CO", 6), ("Wyoming", "WY", 51), ("Utah", "UT", 45), ("Nebraska", "NE", 28)],
        "state_name string, state_abbrev string, state_id int",
    )
    out = P.build_master_corpus(manual, api, dim)
    corpus = {(r["state_abbrev"], r["bill_number"]): r for r in out["corpus"].collect()}
    assert len(corpus) == 3  # CO dedup'd, US dropped
    co = corpus[("CO", "HB1336")]
    assert co["collection_method"] == "Both_Manual_and_API"  # W5 flag survives W1 dedup
    assert co["status"] == "Enacted"  # SIGNED -> Enacted
    assert co["state"] == "Colorado"  # dim join fills name
    missing = {r["state_abbrev"] for r in out["missing_states"].collect()}
    assert missing == {"NE"}


def test_build_corpus_filters_and_dedup(spark):
    corpus = spark.createDataFrame(
        [
            ("CO_HB1", "CO", 2020, "HB1", "T", "Enacted", None, None, None, "x" * 60),
            ("CO_HB1", "CO", 2020, "HB1", "T", "Enacted", None, None, None, "y" * 60),  # dup
            ("CO_HB2", "CO", 2009, "HB2", "T", "Other", None, None, None, "z" * 60),  # year
            ("CO_HB3", "CO", 2020, "HB3", "T", "Other", None, None, None, "short"),  # len
            ("Colorado_HB4", "Colorado", 2020, "HB4", "T", "Other", None, None, None, "w" * 60),  # state len
        ],
        "bill_id string, state string, year int, bill_number string, title string, status string, last_action_date string, matched_keywords string, raw_text string, normalized_text string",
    )
    decisions = spark.createDataFrame(
        [Row(bill_id="CO_HB1", is_amendment=True, text_source="legiscan_api")]
    )
    out = P.build_corpus(corpus, decisions)
    rows = out["corpus"].collect()
    assert [r["bill_id"] for r in rows] == ["CO_HB1"]
    assert rows[0]["is_amendment"] is True


def test_collect_bills_nested_filters(spark):
    bills = spark.createDataFrame(
        [
            Row(
                bill_id=1, state="CO", bill_number="HB 1336", title="School shooting prevention",
                url="u1", status=4, status_date="2023-05-01", description="guns",
                progress=[Row(date="2023-05-01", event=8)],
                texts=[Row(doc_id=10, url="t-pdf", mime_id=2), Row(doc_id=11, url="t-html", mime_id=1)],
            ),
            Row(  # wrong status, no chaptered event
                bill_id=2, state="CO", bill_number="HB2", title="school shooting",
                url="u2", status=1, status_date="2023-05-01", description="",
                progress=[Row(date="2023-05-01", event=1)], texts=[],
            ),
            Row(  # no keyword match
                bill_id=3, state="CO", bill_number="HB3", title="budget bill",
                url="u3", status=4, status_date="2023-05-01", description="money",
                progress=[], texts=[],
            ),
            Row(  # out of year range
                bill_id=4, state="CO", bill_number="HB4", title="school shooting",
                url="u4", status=4, status_date="2008-01-01", description="",
                progress=[], texts=[],
            ),
        ]
    )
    out = P.collect_bills(bills, ["school shooting", "firearm"]).collect()
    assert len(out) == 1
    row = out[0]
    assert row["bill_number"] == "HB1336"
    assert row["legiscan_text_url"] == "t-html"  # W4: HTML preferred over PDF
    assert row["status"] == "Enacted"  # progress event 8 override
    assert row["matched_keywords"] == "school shooting"


def test_tag_documents_demo_dag(spark, tmp_path=None):
    import json
    recs = spark.createDataFrame(
        [
            (1, "School counseling act", "Funds mental health counselors and SRO training"),
            (2, "Budget", "Appropriations for roads"),
        ],
        "bill_id int, title string, description string",
    )
    out = {r["bill_id"]: r["tags"] for r in P.tag_documents(recs, ["title"]).collect()}
    assert out[1] == ["mental_health", "policing"]
    assert out[2] == []


def test_latest_artifact(spark):
    import os, tempfile
    from dissertation_data_pipeline_spark.sources.io import latest_artifact
    d = tempfile.mkdtemp()
    for name in ["results_20260101_000000.csv", "results_20260401_120000.csv"]:
        open(os.path.join(d, name), "w").write("x")
    assert latest_artifact(os.path.join(d, "results_*.csv")).endswith("results_20260401_120000.csv")


def test_fuzzy_rename_exact_match_beats_substring_steal(spark):
    from dissertation_data_pipeline_spark.plans.pipelines import BILL_HEADER_ALIASES
    from dissertation_data_pipeline_spark.schemas import fuzzy_rename

    df = spark.createDataFrame(
        [("HB1", "2024-01-01", "Passed", "T")],
        ["Bill No", "Last Date", "Bill Status", "Bill Title"],
    )
    out = fuzzy_rename(df, BILL_HEADER_ALIASES)
    # no state column exists: nothing may masquerade as 'state', and the
    # date/status columns must map to their own targets
    assert "state" not in out.columns
    assert "last_action_date" in out.columns
    assert "status" in out.columns
