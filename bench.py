"""Benchmark runner — the driver's per-round BENCH contract.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced to execute fully (count over the result — keeps all
computation in the JVM; no driver-side row materialization skews).
A warmup pass on sf0.001 absorbs JVM/codegen startup so timings measure
the plans, not the JIT.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dissertation_data_pipeline_spark.plans.registry import QUERIES  # noqa: E402
from dissertation_data_pipeline_spark.session import get_spark  # noqa: E402

#: headline queries — one per operator family, the judge's comparison set
HEADLINE = [
    "flagship_corpus_rollup",
    "j2_dim_rollup",
    "j6_multikey_join",
    "w2_latest_per_key",
    "a9_coalesce_fill",
    "p4_filter_project",
    "u3_distinct",
    "ext_dedup_tokenset",
    "ext_minhash_lsh_pairs",
    "ext_simhash_pairs",
    "ext_ann_brute_topk",
    "ext_ann_lsh_topk",
    "ext_quality_score",
    "s_session_window",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("ddp-bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in QUERIES]
    names += [n for n in QUERIES if n not in names]

    # warmup: run the flagship at the smallest SF to absorb JVM startup
    QUERIES["flagship_corpus_rollup"].fn(spark, "/root/testdata/sf0.001").count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
