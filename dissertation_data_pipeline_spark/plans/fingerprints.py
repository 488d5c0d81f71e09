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

Scope honesty: the fingerprint sees the REGISTRATION site, not the
operator modules it calls — a semantics change buried in (say)
``dedup_ext`` with an unchanged call site still needs its manual
CODE_CHANGED_ROUND entry.  In practice the call site almost always
moves with the semantics (defaults, aliases, oracle SQL), which is
exactly the class of change ADVICE r7 worried about.
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
