#!/usr/bin/env python3
"""Pinned-vs-unpinned A/B for the pair-generating repartitions.

Every output-exploding join in the engine spreads its input through
``session.pin_spread`` — an EXPLICIT-count repartition that defeats
AQE's input-byte coalescing (which otherwise serializes candidate-pair
explosions: measured 479 s -> 2.2 s on the sf1 interval join).  The
trade costs a fixed exchange at small scale; this runner quantifies
that cost so round-over-round bench deltas are attributable:

  pinned   — production config (pin_spread repartitions to the
             shuffle-partition count)
  unpinned — spark.graft.unpinnedAB=true: pin_spread reverts to the
             pre-pin shape (hash-by-cols without a count, or no
             repartition), leaving AQE free to coalesce

Protocol: one warmup at sf0.001, then median of N (default 3) timed
passes per mode over the pair-family queries, both modes interleaved
per pass so host drift hits both equally.

Usage:
    python tools/bench_pinned_ab.py [OUT.json] [SF_DIR] [N_PASSES]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dissertation_data_pipeline_spark.plans.registry import QUERIES  # noqa: E402
from dissertation_data_pipeline_spark.session import get_spark  # noqa: E402

#: the queries whose plans contain a pin_spread site (pair generation,
#: PQ encode, ANN scoring spreads)
PAIR_QUERIES = [
    "ext_minhash_lsh_pairs",
    "ext_simhash_pairs",
    "ext_near_dup_components",
    "ext_containment_pairs",
    "ext_capped_jaccard_pairs",
    "ext_blocked_jaccard_pairs",
    "ext_fuzzy_levenshtein_pairs",
    "ext_semantic_dedup",
    "ext_ann_brute_topk",
    "ext_ann_lsh_topk",
    "ext_ann_ivf_topk",
    "ext_ann_pq_codes",
    "ext_ann_ivfpq_rerank",
    "ext_interval_join",
    "ext_curation_pipeline",
]


from statistics import median  # noqa: E402


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_AB.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    spark = get_spark("ddp-bench-pinned-ab")
    spark.sparkContext.setLogLevel("ERROR")
    names = [n for n in PAIR_QUERIES if n in QUERIES]

    # Warmup both modes at the SF UNDER TEST (codegen, python workers,
    # scan caches).  Warming elsewhere (or silently no-opping on a host
    # without that path) pushes warmup cost into the first timed pass —
    # which is always 'pinned', biasing the A/B delta (ADVICE r5).
    # Failures are logged, never swallowed: a failed warmup means the
    # first timed pass absorbs it.
    for mode in ("false", "true"):
        spark.conf.set("spark.graft.unpinnedAB", mode)
        for n in names:
            try:
                QUERIES[n].fn(spark, sf_dir).count()
            except Exception as e:  # noqa: BLE001 - report, keep warming
                print(
                    f"warmup FAILED ({n}, unpinnedAB={mode}): "
                    f"{type(e).__name__}: {e}",
                    file=sys.stderr,
                )

    runs = {"pinned": [], "unpinned": []}
    for _ in range(n_passes):
        for label, flag in (("pinned", "false"), ("unpinned", "true")):
            spark.conf.set("spark.graft.unpinnedAB", flag)
            t: dict[str, float] = {}
            for n in names:
                t0 = time.perf_counter()
                QUERIES[n].fn(spark, sf_dir).count()
                t[n] = round(time.perf_counter() - t0, 3)
            runs[label].append(t)
    spark.conf.set("spark.graft.unpinnedAB", "false")

    med = {
        label: {n: round(median([p[n] for p in passes]), 3) for n in names}
        for label, passes in runs.items()
    }
    delta = {
        n: round(med["pinned"][n] - med["unpinned"][n], 3) for n in names
    }
    summary = {
        "sf_dir": sf_dir,
        "n_passes": n_passes,
        "pinned_total": round(sum(med["pinned"].values()), 3),
        "unpinned_total": round(sum(med["unpinned"].values()), 3),
        "pinned_cost_total": round(sum(delta.values()), 3),
        "median": med,
        "delta_pinned_minus_unpinned": delta,
        "passes": runs,
    }
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=1)
        fh.write("\n")
    print(json.dumps({k: summary[k] for k in (
        "sf_dir", "pinned_total", "unpinned_total", "pinned_cost_total"
    )}))


if __name__ == "__main__":
    main()
