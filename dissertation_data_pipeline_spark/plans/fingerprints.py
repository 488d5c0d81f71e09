"""Per-query gate fingerprints — the mechanical backstop for
``registry.CODE_CHANGED_ROUND`` (ADVICE r7: a hand-maintained dict
silently weakens the staleness rotation when a semantic change forgets
to bump its entry).

``gate_fingerprint`` hashes what the driver gate actually depends on at
the registration site: the query function's AST (docstrings stripped —
prose edits don't flag) plus the whitespace-normalized oracle SQL.
``tools/update_gate_fingerprints.py`` records them in
``gate_fingerprints.json`` stamped with the round the change landed in;
``tests/test_gate_fingerprints.py`` then enforces (a) the recorded
fingerprints match the code, and (b) any query whose fingerprint
changed AFTER its last driver green carries a CODE_CHANGED_ROUND entry
at least that recent — so forgetting the bump fails CI instead of
quietly parking a changed row in the fresh-green tail.

Scope (round 9 closes the r8 verdict's hole): alongside the
registration-site fingerprint (``fp``), each query records a
DEPENDENCY fingerprint (``dep_fp``) — the union of docstring-stripped
module AST hashes for every ENGINE module (``operators``/``functions``/
``streaming``/``sources``/``schemas``/``tables``) the query's defining
plans module transitively imports, resolved at runtime from actual
module objects so package re-exports (``from ..operators import x``)
attribute to the submodule that DEFINES ``x``.  A semantics change
buried deep in (say) ``dedup_ext`` now flags every dependent query
mechanically, with no call-site motion and no manual
CODE_CHANGED_ROUND entry required to notice it.

The defining plans module's own HELPERS (shared SQL-rendering
functions, module-level constants) are hashed too — as a filtered
helper hash folded into ``dep_fp``: module-level function defs WITHOUT
a ``@register`` decorator plus assignments, so adding a sibling query
does not restamp a module, but editing a helper every query in it
calls does.  Registry bookkeeping names (CODE_CHANGED_ROUND,
DRIVER_PRIORITY, GREEN_PRIOR_ROUNDS) are excluded — they change every
round by design and would mass-flag registry.py's queries.

Residual exclusions, documented honestly: ``session.py`` and
``compat.py`` are outside the closure (partitioning helpers and
availability shims whose outputs are result-invariant by design and
separately tested).
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import json
import re
import textwrap
from pathlib import Path

FINGERPRINT_FILE = Path(__file__).with_name("gate_fingerprints.json")


def _strip_docstrings(tree: ast.AST) -> ast.AST:
    for node in ast.walk(tree):
        if isinstance(
            node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef, ast.Module)
        ):
            body = getattr(node, "body", None)
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                node.body = body[1:] or [ast.Pass()]
    return tree


def gate_fingerprint(fn, sql: str | None) -> str:
    """sha256 over the query fn's docstring-stripped AST dump + the
    whitespace-normalized oracle SQL.  Comments and prose never flag;
    code and SQL token changes always do."""
    src = textwrap.dedent(inspect.getsource(fn))
    tree = _strip_docstrings(ast.parse(src))
    norm_sql = " ".join((sql or "").split())
    h = hashlib.sha256()
    h.update(ast.dump(tree).encode())
    h.update(b"\x00")
    h.update(norm_sql.encode())
    return h.hexdigest()


def current_round() -> int:
    """The in-progress driver round: 1 + the highest recorded
    CORRECTNESS_r*.json round (the driver writes round N's file at the
    END of round N)."""
    repo = Path(__file__).resolve().parents[2]
    rounds = [
        int(m.group(1))
        for p in repo.glob("CORRECTNESS_r*.json")
        if (m := re.search(r"r(\d+)", p.name))
    ]
    return (max(rounds) + 1) if rounds else 1


def recorded_fingerprints() -> dict[str, dict]:
    try:
        return json.loads(FINGERPRINT_FILE.read_text())
    except (OSError, ValueError):
        return {}


def computed_fingerprints() -> dict[str, str]:
    from dissertation_data_pipeline_spark.plans.registry import QUERIES

    return {
        name: gate_fingerprint(q.fn, q.sql) for name, q in QUERIES.items()
    }


# ---------------------------------------------------------------------------
# Dependency fingerprints (engine-module closure)
# ---------------------------------------------------------------------------

_PKG = "dissertation_data_pipeline_spark"

#: Engine namespaces whose content participates in dep_fp.  plans.* is
#: deliberately OUT (module docstring explains); session/compat are out
#: by the same noise argument.
_ENGINE_PREFIXES = (
    f"{_PKG}.operators",
    f"{_PKG}.functions",
    f"{_PKG}.streaming",
    f"{_PKG}.sources",
    f"{_PKG}.schemas",
    f"{_PKG}.tables",
)

_module_hash_cache: dict[str, str] = {}
_module_deps_cache: dict[str, frozenset[str]] = {}


def _is_engine_module(name: str) -> bool:
    return any(
        name == p or name.startswith(p + ".") for p in _ENGINE_PREFIXES
    )


def module_content_hash(mod_name: str) -> str:
    """sha256 of the module's docstring-stripped AST dump — same
    comment/prose immunity as the per-query fingerprint."""
    if mod_name not in _module_hash_cache:
        import importlib

        mod = importlib.import_module(mod_name)
        src = inspect.getsource(mod)
        tree = _strip_docstrings(ast.parse(src))
        _module_hash_cache[mod_name] = hashlib.sha256(
            ast.dump(tree).encode()
        ).hexdigest()
    return _module_hash_cache[mod_name]


def _direct_engine_deps(mod_name: str) -> frozenset[str]:
    """Engine modules a module directly depends on, resolved from its
    import STATEMENTS against live module objects: ``from X import f``
    attributes to ``f.__module__`` (the defining submodule — precise
    through package re-exports); module imports attribute to the
    module; value imports (constants) fall back to the source module
    ``X`` itself."""
    if mod_name in _module_deps_cache:
        return _module_deps_cache[mod_name]
    import importlib

    mod = importlib.import_module(mod_name)
    deps: set[str] = set()

    def _add(name: str) -> None:
        if _is_engine_module(name) and name != mod_name:
            deps.add(name)

    tree = ast.parse(inspect.getsource(mod))
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                _add(alias.name)
        elif isinstance(node, ast.ImportFrom):
            if node.level:  # relative: resolve against the package
                base = mod_name.rsplit(".", node.level)[0]
                src_mod = f"{base}.{node.module}" if node.module else base
            else:
                src_mod = node.module or ""
            if not src_mod.startswith(_PKG):
                continue
            try:
                src_obj = importlib.import_module(src_mod)
            except ImportError:
                _add(src_mod)
                continue
            for alias in node.names:
                # `from pkg import name` where name IS a submodule:
                # resolve by IMPORT, not getattr — the package's
                # submodule attribute only exists once something has
                # imported it, so getattr-resolution would depend on
                # process import history (found live: pytest's
                # empty-input run imported operators.quality_checks,
                # flipping queries_analytics' closure from the
                # operators package to the submodule mid-suite)
                try:
                    sub = importlib.import_module(
                        f"{src_mod}.{alias.name}"
                    )
                    _add(sub.__name__)
                    continue
                except ImportError:
                    pass
                val = getattr(src_obj, alias.name, None)
                import types

                if isinstance(val, types.ModuleType):
                    _add(val.__name__)
                elif getattr(val, "__module__", None):
                    _add(val.__module__)
                else:
                    _add(src_mod)
    _module_deps_cache[mod_name] = frozenset(deps)
    return _module_deps_cache[mod_name]


def engine_dep_closure(mod_name: str) -> frozenset[str]:
    """Transitive engine-module dependencies of ``mod_name`` (which may
    itself be a plans module — the traversal root is never included
    unless reached through an engine module)."""
    seen: set[str] = set()
    frontier = list(_direct_engine_deps(mod_name))
    while frontier:
        m = frontier.pop()
        if m in seen:
            continue
        seen.add(m)
        frontier.extend(_direct_engine_deps(m) - seen)
    return frozenset(seen)


def dep_fingerprint(mod_name: str) -> str:
    """sha256 over the sorted (module, content-hash) pairs of the
    engine-dep closure — shared by every query the module defines."""
    h = hashlib.sha256()
    for dep in sorted(engine_dep_closure(mod_name)):
        h.update(dep.encode())
        h.update(b"\x00")
        h.update(module_content_hash(dep).encode())
        h.update(b"\n")
    return h.hexdigest()


#: dep_fp FORMAT version — bump when the hash's scope/derivation
#: changes (not when code changes).  The update tool migrates entries
#: across versions by adopting the new hash WITHOUT restamping the
#: round: a format change makes no claim about code history, and
#: restamping would spuriously rotate the whole registry.  v2 = engine
#: dep closure + defining-module helper hash (round 9); v3 = submodule
#: imports resolved by import (not getattr), making the closure
#: independent of process import history (round 9 fix).
DEP_FP_VERSION = 3

#: registry bookkeeping assignments that change every round by design
_BOOKKEEPING_NAMES = {
    "CODE_CHANGED_ROUND",
    "DRIVER_PRIORITY",
    "GREEN_PRIOR_ROUNDS",
}


def _is_register_decorated(node: ast.AST) -> bool:
    for dec in getattr(node, "decorator_list", []):
        target = dec.func if isinstance(dec, ast.Call) else dec
        if isinstance(target, ast.Name) and target.id == "register":
            return True
        if isinstance(target, ast.Attribute) and target.attr == "register":
            return True
    return False


def helper_hash_of_source(src: str) -> str:
    """sha256 over a module source's NON-QUERY top-level code:
    function defs without a ``@register`` decorator (shared SQL
    renderers, engine-side helpers) and assignments (CTE templates,
    block/cutoff constants), docstrings stripped.  Registered query
    fns are excluded so adding a sibling query never restamps a
    module; registry bookkeeping names are excluded so round rotation
    edits never mass-flag."""
    tree = ast.parse(src)
    kept: list[ast.AST] = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            if not _is_register_decorated(node):
                kept.append(node)
        elif isinstance(node, (ast.Assign, ast.AnnAssign)):
            targets = (
                node.targets
                if isinstance(node, ast.Assign)
                else [node.target]
            )
            names = {
                t.id for t in targets if isinstance(t, ast.Name)
            }
            if not (names & _BOOKKEEPING_NAMES):
                kept.append(node)
    pruned = ast.Module(body=kept, type_ignores=[])
    _strip_docstrings(pruned)
    return hashlib.sha256(ast.dump(pruned).encode()).hexdigest()


def plans_helper_hash(mod_name: str) -> str:
    """``helper_hash_of_source`` of the module's current source."""
    import importlib

    mod = importlib.import_module(mod_name)
    return helper_hash_of_source(inspect.getsource(mod))


def computed_dep_fingerprints() -> dict[str, str]:
    """Per-query dep_fp (queries defined in the same plans module share
    one closure + helper hash, so this is ~30 computations for ~250
    queries)."""
    from dissertation_data_pipeline_spark.plans.registry import QUERIES

    per_module: dict[str, str] = {}
    out: dict[str, str] = {}
    for name, q in QUERIES.items():
        mod = q.fn.__module__
        if mod not in per_module:
            h = hashlib.sha256()
            h.update(dep_fingerprint(mod).encode())
            h.update(b"\x00helpers\x00")
            h.update(plans_helper_hash(mod).encode())
            per_module[mod] = h.hexdigest()
        out[name] = per_module[mod]
    return out
