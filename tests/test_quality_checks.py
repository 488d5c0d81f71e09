"""Data-quality expectations layer: constraint semantics + the
one-pass plan contract."""

from __future__ import annotations

import pytest

from dissertation_data_pipeline_spark.operators import quality_checks as qc


@pytest.fixture(scope="module")
def spark():
    from dissertation_data_pipeline_spark.session import get_spark

    return get_spark()


@pytest.fixture(scope="module")
def fact(spark):
    return spark.createDataFrame(
        [
            (1, "A", 10.0, "x-1"),
            (2, "B", 20.0, "x-2"),
            (2, "B", 30.0, "x-3"),  # duplicate key 2
            (3, None, -5.0, "bad"),  # null status, range + pattern violations
            (4, "Z", 40.0, "x-4"),  # out-of-set status, dangling FK
        ],
        "id long, status string, amount double, code string",
    )


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame([(1,), (2,), (3,)], "ref_id long")


def test_all_constraint_kinds(spark, fact, dim):
    report = {
        r["check"]: (r["violations"], r["n_rows"], r["passed"])
        for r in qc.run_checks(
            fact,
            [
                qc.not_null("status"),
                qc.in_set("status", ["A", "B"]),
                qc.in_range("amount", 0, 100),
                qc.matches("code", r"x-\d"),
                qc.unique("id"),
                qc.foreign_key("id", dim, "ref_id"),
            ],
        ).collect()
    }
    assert report["not_null(status)"] == (1, 5, False)
    assert report["in_set(status)"] == (2, 5, False)  # null + 'Z'
    assert report["in_range(amount)"] == (1, 5, False)
    assert report["matches(code)"] == (1, 5, False)
    # both rows of the duplicated key count as violations
    assert report["unique(id)"] == (2, 5, False)
    assert report["foreign_key(id)"] == (1, 5, False)


def test_clean_table_passes(spark, dim):
    clean = spark.createDataFrame([(1, "A"), (2, "B")], "id long, status string")
    rows = qc.run_checks(
        clean,
        [qc.not_null("id"), qc.in_set("status", ["A", "B"]), qc.unique("id")],
    ).collect()
    assert all(r["passed"] for r in rows)
    assert all(r["n_rows"] == 2 for r in rows)


def test_row_checks_share_one_aggregation(spark, fact):
    """All row-local constraints compile into a single aggregate over a
    single scan — adding constraints must not add passes."""
    df = qc.run_checks(
        fact,
        [
            qc.not_null("status"),
            qc.in_set("status", ["A", "B"]),
            qc.in_range("amount", 0, 100),
            qc.matches("code", r"x-\d"),
        ],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") == 1, plan


def test_empty_table_reports_zero_rows(spark):
    empty = spark.createDataFrame([], "id long, status string")
    rows = {
        r["check"]: (r["violations"], r["n_rows"], r["passed"])
        for r in qc.run_checks(
            empty, [qc.not_null("id"), qc.unique("id")]
        ).collect()
    }
    assert rows["not_null(id)"] == (0, 0, True)
    assert rows["unique(id)"] == (0, 0, True)
