"""Audit every registered query's OUTPUT schema for driver-gate hazards.

The external correctness gate canonicalizes Spark + DuckDB results
through pandas (sort_values + per-value stringify). That canon is known
to crash or mis-hash on:

- array / map / struct output columns (``unhashable type: 'list'``),
- integers wider than int64 (DuckDB HUGEINT -> object/float coercion),
- DECIMAL outputs (pandas object(Decimal) stringification differs from
  DuckDB's Decimal repr in trailing zeros).

This tool builds each query's plan (schema only, no action) and flags
any output column whose type is not one of the gate-stable scalars:
string, long/int/short/byte, double/float, boolean, date, timestamp,
binary.

Usage: python tools/audit_gate_schemas.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

SAFE = {
    "string", "long", "integer", "short", "byte", "double", "float",
    "boolean", "date", "timestamp", "timestamp_ntz", "binary",
}


def main():
    import __spark_entry__ as entrymod
    from dissertation_data_pipeline_spark.session import get_spark

    spark = get_spark("gate-schema-audit")
    bad = 0
    oracles = entrymod.oracle_sql()
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, SF_DIR)
        except Exception as e:  # pragma: no cover - report and continue
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            bad += 1
            continue
        hazards = [
            f"{f.name}:{f.dataType.typeName()}"
            for f in df.schema.fields
            if f.dataType.typeName() not in SAFE
        ]
        if hazards:
            print(f"HAZ  {name}: {', '.join(hazards)}")
            bad += 1
        if name not in oracles:
            print(f"NOOR {name}: rows-only (no oracle SQL)")
    print(f"done: {bad} hazardous queries")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
