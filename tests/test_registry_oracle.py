"""Oracle-equivalence tests: every registry query vs its DuckDB twin.

Mirrors the driver's t2 gate (row count + column set + order-insensitive
value hash) at sf0.001 so the full suite stays fast; the driver runs the
same comparison at sf0.01.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from dissertation_data_pipeline_spark.plans.registry import QUERIES
from dissertation_data_pipeline_spark.tables import TABLE_NAMES

SF_DIR = "/root/testdata/sf0.001"


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def fingerprint(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    h = hashlib.sha256()
    for line in sorted("|".join(canon(r[i]) for i in order) for r in rows):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", list(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    q = QUERIES[name]
    sdf = q.fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if q.sql is None:
        assert srows is not None  # rows-only check: it ran
        return
    rel = duck.sql(q.sql)
    dcols = list(rel.columns)
    drows = [tuple(r) for r in rel.fetchall()]
    assert len(srows) == len(drows), f"rowcount {len(srows)} != {len(drows)}"
    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in dcols)
    assert fingerprint(scols, srows) == fingerprint(dcols, drows)
