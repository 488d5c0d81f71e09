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

from dissertation_data_pipeline_spark.plans import fingerprints as fp_mod
from dissertation_data_pipeline_spark.plans.fingerprints import (
    computed_dep_fingerprints,
    computed_fingerprints,
    recorded_fingerprints,
)
from dissertation_data_pipeline_spark.plans.registry import (
    last_green_rounds,
)


def test_fingerprints_file_is_current():
    recorded = recorded_fingerprints()
    assert recorded, (
        "plans/gate_fingerprints.json missing/empty — run "
        "tools/update_gate_fingerprints.py (--bootstrap for first use)"
    )
    computed = computed_fingerprints()
    dep = computed_dep_fingerprints()
    missing = sorted(set(computed) - set(recorded))
    stale = sorted(set(recorded) - set(computed))
    drifted = sorted(
        n for n in computed if n in recorded and recorded[n]["fp"] != computed[n]
    )
    dep_drifted = sorted(
        n
        for n in dep
        if n in recorded and recorded[n].get("dep_fp") != dep[n]
    )
    assert not (missing or stale or drifted or dep_drifted), (
        "gate fingerprints out of date — run tools/update_gate_fingerprints.py "
        "(and add/refresh CODE_CHANGED_ROUND entries for semantic changes). "
        f"missing={missing} dropped={stale} drifted={drifted} "
        f"dep_drifted={dep_drifted}"
    )


def test_changed_after_green_queries_rotate_to_front():
    """Round 9 wires the MECHANICAL fingerprint rounds into the
    rotation (registry._changed_rounds), so a changed-after-green
    query no longer depends on a hand-maintained CODE_CHANGED_ROUND
    entry to be re-verified: assert every such query sorts BEFORE
    every fresh-green query in the gate ordering.

    Known loophole (ADVICE r8): round granularity cannot distinguish
    order WITHIN a round — a second code change landing after a
    driver green in the SAME round reads as changed == green and is
    handled by the rotation's conservative `>=` (one extra re-check),
    but a change landing after the SAME-round stamp escapes until the
    next update_gate_fingerprints run; the residual risk is one round
    of staleness, caught by the next round's refresh."""
    from dissertation_data_pipeline_spark.plans.registry import (
        _changed_rounds,
        _ordered_names,
    )

    lg = last_green_rounds()
    changed = _changed_rounds()
    must_rotate = {
        n
        for n, ent in recorded_fingerprints().items()
        if ent.get("round", 0) >= 1
        and n in lg
        and ent["round"] > lg[n]
    }
    # the union view the rotation actually uses must cover the
    # fingerprint stamps (manual entries can only raise the round)
    for n in must_rotate:
        assert changed[n] >= recorded_fingerprints()[n]["round"]
    order = _ordered_names()
    pos = {n: i for i, n in enumerate(order)}
    fresh_green = [
        n
        for n in order
        if n in lg and changed.get(n, 0) < lg[n]
    ]
    if not fresh_green:
        return  # every green row is queued for re-check — vacuous
    first_fresh = min(pos[n] for n in fresh_green)
    offenders = [n for n in must_rotate if pos[n] > first_fresh]
    assert not offenders, (
        "changed-after-green queries sorted behind fresh greens "
        f"(would escape the bounded gate budget): {sorted(offenders)[:8]}"
    )


def test_deep_operator_change_flags_dependent_queries(monkeypatch):
    """The r8 verdict's scope-hole closure, proved mechanically: a
    simulated semantics change in operators/dedup_ext.py (content hash
    swapped, call sites untouched) must change the dep_fp of EVERY
    query whose plans module reaches dedup_ext through the engine
    import closure — and of no other query."""
    target = "dissertation_data_pipeline_spark.operators.dedup_ext"
    before = computed_dep_fingerprints()

    real_hash = fp_mod.module_content_hash

    def fake_hash(mod_name):
        if mod_name == target:
            return "0" * 64  # a one-line edit, as the hash sees it
        return real_hash(mod_name)

    monkeypatch.setattr(fp_mod, "module_content_hash", fake_hash)
    fp_mod._module_hash_cache.clear()
    try:
        after = computed_dep_fingerprints()
    finally:
        fp_mod._module_hash_cache.clear()

    from dissertation_data_pipeline_spark.plans.registry import QUERIES

    flagged = {n for n in before if before[n] != after[n]}
    dependent = {
        n
        for n, q in QUERIES.items()
        if target in fp_mod.engine_dep_closure(q.fn.__module__)
    }
    # sanity: the closure actually reaches dedup_ext from the dedup and
    # incremental-dedup registration modules
    assert "ext_minhash_lsh_pairs" in dependent
    assert "ext_dedup_incremental" in dependent
    assert flagged == dependent, (
        f"missed={sorted(dependent - flagged)[:5]} "
        f"spurious={sorted(flagged - dependent)[:5]}"
    )
    assert flagged, "no query depends on dedup_ext — closure is broken"


def test_plans_module_helper_change_flags_its_queries(monkeypatch):
    """The round-9 residual hole, closed: a shared helper edit INSIDE
    a plans module (e.g. a SQL-rendering function the queries call)
    must change the dep_fp of every query that module defines — and of
    no other module's queries."""
    target_mod = "dissertation_data_pipeline_spark.plans.queries_dedup"
    before = computed_dep_fingerprints()

    real = fp_mod.plans_helper_hash

    def fake(mod_name):
        if mod_name == target_mod:
            return "0" * 64  # a one-line helper edit, as the hash sees it
        return real(mod_name)

    monkeypatch.setattr(fp_mod, "plans_helper_hash", fake)
    after = computed_dep_fingerprints()

    from dissertation_data_pipeline_spark.plans.registry import QUERIES

    flagged = {n for n in before if before[n] != after[n]}
    expected = {n for n, q in QUERIES.items() if q.fn.__module__ == target_mod}
    assert flagged == expected, (
        f"missed={sorted(expected - flagged)[:5]} "
        f"spurious={sorted(flagged - expected)[:5]}"
    )
    assert flagged


def test_sibling_query_addition_does_not_restamp_module():
    """The helper hash must be invariant to adding/removing a
    @register-decorated query def (siblings must not restamp when a
    new query lands in their module) but sensitive to a one-line edit
    in a shared helper."""
    src = '''
from dissertation_data_pipeline_spark.plans.registry import register

_BLOCK = 500

def _shared_sql(src):
    return f"SELECT * FROM {src} WHERE x < 2"

@register("q_one", _shared_sql("t"))
def q_one(spark, sf_dir):
    return None
'''
    added_query = src + '''

@register("q_two", _shared_sql("u"))
def q_two(spark, sf_dir):
    return None
'''
    helper_edited = src.replace("x < 2", "x < 3")
    constant_edited = src.replace("_BLOCK = 500", "_BLOCK = 1000")
    base = fp_mod.helper_hash_of_source(src)
    assert fp_mod.helper_hash_of_source(added_query) == base
    assert fp_mod.helper_hash_of_source(helper_edited) != base
    assert fp_mod.helper_hash_of_source(constant_edited) != base
