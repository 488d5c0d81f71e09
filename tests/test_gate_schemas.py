"""Spark-side twin of test_oracle_types: every registered query's
OUTPUT schema must contain only gate-stable scalar types.

The driver's correctness gate canonicalizes Spark results through
pandas (``toPandas()`` + sort_values + per-value stringify).  That
canon crashes on nested types (``unhashable type: 'list'``) and
mis-hashes DECIMAL (Spark keeps object(Decimal) with trailing zeros,
DuckDB ``.df()`` floats to shortest repr) — the exact class behind all
five round-5 driver reds.  test_oracle_types polices the DuckDB side;
this test polices the Spark side, so the hazard cannot ship from
either direction.

Cost note: building each query's DataFrame at sf0.001 necessarily
EXECUTES the side-effectful rows (streaming drains, sink round-trips)
— there is no schema-only path for those.  All plans are built once in
a session-scoped fixture (~2.5 min at sf0.001); the parametrized
assertions are then free.
"""

from __future__ import annotations

import pytest

from dissertation_data_pipeline_spark.plans.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"

#: Spark ``DataType.typeName()`` values the gate's pandas canonicalizer
#: hashes consistently with the DuckDB oracle (mirrors
#: tools/audit_gate_schemas.py SAFE — keep in sync).
SAFE = {
    "string", "long", "integer", "short", "byte", "double", "float",
    "boolean", "date", "timestamp", "timestamp_ntz", "binary",
}


@pytest.fixture(scope="session")
def query_schemas(spark):
    out = {}
    for name, q in QUERIES.items():
        try:
            out[name] = q.fn(spark, SF_DIR).schema
        except Exception as e:  # noqa: BLE001 - surfaced per-query below
            out[name] = e
    return out


@pytest.mark.parametrize("name", list(QUERIES))
def test_query_output_schema_is_gate_safe(query_schemas, name):
    schema = query_schemas[name]
    if isinstance(schema, Exception):
        pytest.fail(f"{name} failed to build at sf0.001: {schema!r}")
    hazards = [
        f"{f.name}:{f.dataType.typeName()}"
        for f in schema.fields
        if f.dataType.typeName() not in SAFE
    ]
    assert not hazards, (
        f"{name} returns gate-unsafe output types {hazards}; final-cast "
        "DECIMAL to double at the edge and posexplode nested values "
        "(the driver canon floats/crashes on them — see r5 verdict)"
    )
