"""Median-of-N subset timer — bench.py's methodology on a query subset.

bench.py times all 247 registry queries (one ~5-minute pass each at
sf0.1), which is the wrong tool while ITERATING on a handful of
queries. This runs exactly bench's loop (sf0.001 warmup pass, then N
timed `.count()` passes with drop_blocks between queries, per-query
median) on just the names given.

Usage:
    python tools/time_queries.py NAME [NAME ...] [--sf DIR] [--passes N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from statistics import median

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="+", help="registry query names")
    ap.add_argument("--sf", default="/root/testdata/sf0.1", help="data dir")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    from dissertation_data_pipeline_spark.plans.registry import QUERIES
    from dissertation_data_pipeline_spark.session import drop_blocks, get_spark

    unknown = [n for n in args.names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark("ddp-time-queries")
    spark.sparkContext.setLogLevel("ERROR")

    for name in args.names:
        QUERIES[name].fn(spark, "/root/testdata/sf0.001").count()
    drop_blocks(spark)

    passes: list[dict[str, float]] = []
    for _ in range(args.passes):
        run: dict[str, float] = {}
        for name in args.names:
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, args.sf).count()
            run[name] = round(time.perf_counter() - t0, 3)
            drop_blocks(spark)
        passes.append(run)

    out = {
        "sf": args.sf,
        "passes": passes,
        "loadavg": round(os.getloadavg()[0], 1),
        "median": {
            n: round(median(p[n] for p in passes), 3) for n in args.names
        },
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
