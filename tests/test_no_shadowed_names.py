"""Repo-wide guard against silently shadowed definitions.

Python module semantics keep only the LAST of two same-named
top-level ``def``/``class`` statements — so a duplicated test
function never runs and a duplicated helper silently replaces its
earlier twin, with no error from the interpreter, pytest, or CI.
Round 14 hit exactly this: ``tests/test_dialect.py`` carried two
``test_advice_r13_fixes`` functions and the newer ADVICE pins were
skipped by every green suite run until an AST audit noticed.

This is the module-level sibling of
``leak_probe.plain_duplicate_keys()`` (which audits dict literals):
walk every Python file in the repo and assert no module defines the
same top-level (or class-level) name twice.  Decorator-stacked
overloads and ``if TYPE_CHECKING`` twins don't occur in this repo,
so an exact-name collision is always a bug here.
"""

import ast
import collections
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SCAN_DIRS = ("clickbom_spark", "tests", "scripts")
TOP_FILES = ("__spark_entry__.py", "bench.py")


def _py_files():
    for d in SCAN_DIRS:
        yield from sorted((REPO / d).rglob("*.py"))
    for f in TOP_FILES:
        p = REPO / f
        if p.exists():
            yield p


def _duplicates(body):
    names = [
        node.name
        for node in body
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef))
    ]
    return [name for name, n in collections.Counter(names).items() if n > 1]


def test_no_module_shadows_a_definition():
    offenders = {}
    for path in _py_files():
        tree = ast.parse(path.read_text(), filename=str(path))
        rel = str(path.relative_to(REPO))
        dupes = _duplicates(tree.body)
        if dupes:
            offenders[rel] = dupes
        for cls in [n for n in tree.body if isinstance(n, ast.ClassDef)]:
            cdupes = _duplicates(cls.body)
            if cdupes:
                offenders[f"{rel}::{cls.name}"] = cdupes
    assert offenders == {}, (
        "duplicate top-level names silently shadow the earlier "
        f"definition: {offenders}"
    )
