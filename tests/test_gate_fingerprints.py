"""The CODE_CHANGED_ROUND backstop (ADVICE r7).

Two invariants:

1. ``gate_fingerprints.json`` matches the code — any drift means a
   query's registration-site code or oracle SQL changed without
   running ``tools/update_gate_fingerprints.py``.
2. A query whose fingerprint changed AFTER its most recent driver
   green must carry a ``CODE_CHANGED_ROUND`` entry at least as recent
   as the change — otherwise the driver-gate rotation would leave the
   changed row parked in the fresh-green tail, unverified.

Docstring/comment-only edits never flag (the fingerprint strips
docstrings and hashes the AST, and whitespace-normalizes the SQL).
"""

from dissertation_data_pipeline_spark.plans.fingerprints import (
    computed_fingerprints,
    recorded_fingerprints,
)
from dissertation_data_pipeline_spark.plans.registry import (
    CODE_CHANGED_ROUND,
    last_green_rounds,
)


def test_fingerprints_file_is_current():
    recorded = recorded_fingerprints()
    assert recorded, (
        "plans/gate_fingerprints.json missing/empty — run "
        "tools/update_gate_fingerprints.py (--bootstrap for first use)"
    )
    computed = computed_fingerprints()
    missing = sorted(set(computed) - set(recorded))
    stale = sorted(set(recorded) - set(computed))
    drifted = sorted(
        n for n in computed if n in recorded and recorded[n]["fp"] != computed[n]
    )
    assert not (missing or stale or drifted), (
        "gate fingerprints out of date — run tools/update_gate_fingerprints.py "
        "(and add/refresh CODE_CHANGED_ROUND entries for semantic changes). "
        f"missing={missing} dropped={stale} drifted={drifted}"
    )


def test_changed_after_green_queries_have_code_changed_round():
    lg = last_green_rounds()
    offenders = []
    for name, ent in recorded_fingerprints().items():
        rnd = ent.get("round", 0)
        if rnd < 1:
            continue  # pre-fingerprint bootstrap era: no claim
        if name in lg and lg[name] >= rnd:
            continue  # green at/after the change: rotation satisfied
        if name not in lg:
            continue  # never green: sorts into the never-checked bucket
        if CODE_CHANGED_ROUND.get(name, 0) < rnd:
            offenders.append((name, rnd, lg.get(name)))
    assert not offenders, (
        "queries changed after their last driver green but missing a "
        "CODE_CHANGED_ROUND bump (name, changed_round, last_green): "
        f"{offenders}"
    )
