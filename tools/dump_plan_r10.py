"""Capture `.explain("formatted")` for named queries to plans/r10/.

Usage:
    python tools/dump_plan_r10.py before|after <name> [<name> ...]

Writes plans/r10/<name>_<tag>.txt — the judge-checkable evidence for
every plan claim in OPTIMIZATION_r10.md. Uses sf0.001 (plan shapes are
size-independent modulo AQE's runtime picks, and several queries
execute eagerly while building — small SF keeps capture cheap).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    assert tag in ("before", "after"), "first arg must be before|after"

    from dissertation_data_pipeline_spark.plans.registry import QUERIES
    from dissertation_data_pipeline_spark.session import drop_blocks, get_spark

    spark = get_spark("ddp-dump-plan-r10")
    spark.sparkContext.setLogLevel("ERROR")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", "r10")
    os.makedirs(outdir, exist_ok=True)

    for name in names:
        if name not in QUERIES:
            print(f"unknown query {name!r}")
            continue
        df = QUERIES[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — {tag} (sf_dir={SF_DIR})\n\n")
            fh.write(plan)
        print(f"wrote {path}")
        drop_blocks(spark)


if __name__ == "__main__":
    main()
