#!/usr/bin/env python3
"""Refresh plans/gate_fingerprints.json after changing query code.

Unchanged entries keep their recorded round; changed/new entries are
stamped with the CURRENT round (1 + highest CORRECTNESS_r*.json).  Run
with ``--bootstrap`` once to create the file with every round set to 0
("pre-fingerprint era" — no staleness claim made for history).

tests/test_gate_fingerprints.py fails when this file is out of date,
and when a changed-after-green entry lacks a CODE_CHANGED_ROUND bump.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dissertation_data_pipeline_spark.plans.fingerprints import (  # noqa: E402
    DEP_FP_VERSION,
    FINGERPRINT_FILE,
    computed_dep_fingerprints,
    computed_fingerprints,
    current_round,
    recorded_fingerprints,
)


def main() -> int:
    bootstrap = "--bootstrap" in sys.argv
    old = {} if bootstrap else recorded_fingerprints()
    cur = computed_fingerprints()
    dep = computed_dep_fingerprints()
    rnd = 0 if bootstrap else current_round()
    out = {}
    n_changed = 0
    for name in sorted(cur):
        prev = old.get(name)
        fresh = {
            "fp": cur[name],
            "dep_fp": dep[name],
            "dep_v": DEP_FP_VERSION,
            "round": rnd,
        }
        if prev and prev.get("fp") == cur[name]:
            if prev.get("dep_v", 1) != DEP_FP_VERSION or "dep_fp" not in prev:
                # format migration / field bootstrap: adopt the new
                # hash WITHOUT restamping — a format change makes no
                # claim about code history (see DEP_FP_VERSION note)
                out[name] = dict(
                    prev, dep_fp=dep[name], dep_v=DEP_FP_VERSION
                )
            elif prev.get("dep_fp") == dep[name]:
                out[name] = prev
            else:
                out[name] = fresh
                n_changed += 1
                print(f"dep-changed: {name} (stamped round {rnd})")
        else:
            out[name] = fresh
            n_changed += 1
            if prev:
                print(f"changed: {name} (stamped round {rnd})")
            else:
                print(f"new:     {name} (stamped round {rnd})")
    dropped = set(old) - set(cur)
    for name in sorted(dropped):
        print(f"dropped: {name} (no longer registered)")
    FINGERPRINT_FILE.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    print(f"{len(out)} entries, {n_changed} (re)stamped, {len(dropped)} dropped")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
