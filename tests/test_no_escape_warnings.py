"""Every source file must compile clean under warnings-as-errors.

Invalid escape sequences ('\\d' in a non-raw string) are
DeprecationWarnings today and SyntaxErrors on future interpreters;
they slip through normal imports because CPython caches the compiled
module (the warning fires once per .pyc rebuild, so CI sees it only
intermittently).  Compiling from source on every run makes the check
deterministic (ADVICE r7: 36 such warnings had accumulated unseen).
"""

import os
import warnings

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _py_files():
    roots = [
        os.path.join(REPO, "dissertation_data_pipeline_spark"),
        os.path.join(REPO, "tests"),
        os.path.join(REPO, "tools"),
    ]
    singles = [os.path.join(REPO, "bench.py"), os.path.join(REPO, "__spark_entry__.py")]
    out = []
    for root in roots:
        for dirpath, _, files in os.walk(root):
            out.extend(
                os.path.join(dirpath, f) for f in files if f.endswith(".py")
            )
    out.extend(p for p in singles if os.path.exists(p))
    return sorted(out)


@pytest.mark.parametrize("path", _py_files(), ids=lambda p: os.path.relpath(p, REPO))
def test_compiles_without_warnings(path):
    with open(path, encoding="utf-8") as f:
        src = f.read()
    with warnings.catch_warnings():
        warnings.simplefilter("error", SyntaxWarning)
        warnings.simplefilter("error", DeprecationWarning)
        compile(src, path, "exec")
