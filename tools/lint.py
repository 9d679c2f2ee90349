"""Zero-dependency lint gate (stdlib ``ast`` only).

The reference enforces a hygiene tier through pre-commit (checkpatch,
codespell, black, flake8, mypy — /root/reference/.pre-commit-config.yaml)
that this environment cannot pip-install.  This linter provides the
highest-value subset with no dependencies, so the gate actually RUNS both
locally (``python tools/lint.py``, also wired as a pytest in
tests/test_lint.py) and in CI; ruff + mypy run as additional advisory CI
steps where pip is available (.github/workflows/ci.yml).

Checks (suppress one line with ``# noqa``):
  * syntax (ast.parse)
  * unused imports (module scope, ``__all__``-aware)
  * bare ``except:`` clauses
  * mutable default arguments (list/dict/set literals)
  * tabs in indentation, trailing whitespace
  * lines over 100 columns
"""

from __future__ import annotations

import ast
import pathlib
import sys

MAX_COLS = 100

REPO = pathlib.Path(__file__).resolve().parents[1]
TARGETS = [
    "airs_compression_tpu",
    "tests",
    "tools",
    "examples",
    "bench.py",
    "__graft_entry__.py",
]


def _used_names(tree: ast.AST) -> set[str]:
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # attribute roots count (module.attr uses "module")
            root = node
            while isinstance(root, ast.Attribute):
                root = root.value
            if isinstance(root, ast.Name):
                used.add(root.id)
    # names exported via __all__ strings count as used
    for node in ast.walk(tree):
        if (isinstance(node, ast.Assign)
                and any(isinstance(t, ast.Name) and t.id == "__all__"
                        for t in node.targets)):
            for el in ast.walk(node.value):
                if isinstance(el, ast.Constant) and isinstance(el.value, str):
                    used.add(el.value)
    return used


def _import_bindings(tree: ast.Module):
    """ALL import bindings (module + function scope) -> (name, lineno).

    Usage is checked against the whole module's name references, so a
    name imported in one function but used in another is (incorrectly)
    considered used — no false positives, at the cost of missing that
    case.  Fully dead imports anywhere are caught (found by review: a
    function-level import survived the original module-scope-only
    check).
    """
    out = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                name = a.asname or a.name.split(".")[0]
                out.append((name, node.lineno))
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                out.append((a.asname or a.name, node.lineno))
    return out


def lint_file(path: pathlib.Path) -> list[str]:
    src = path.read_text()
    rel = path.relative_to(REPO)
    problems: list[str] = []
    lines = src.splitlines()
    noqa = {i + 1 for i, ln in enumerate(lines) if "# noqa" in ln}

    try:
        tree = ast.parse(src)
    except SyntaxError as e:
        return [f"{rel}:{e.lineno}: syntax error: {e.msg}"]

    for i, ln in enumerate(lines, 1):
        if i in noqa:
            continue
        stripped = ln.rstrip("\n")
        if stripped != stripped.rstrip():
            problems.append(f"{rel}:{i}: trailing whitespace")
        if "\t" in stripped[: len(stripped) - len(stripped.lstrip())]:
            problems.append(f"{rel}:{i}: tab in indentation")
        if len(stripped) > MAX_COLS:
            problems.append(f"{rel}:{i}: line longer than {MAX_COLS} cols "
                            f"({len(stripped)})")

    used = _used_names(tree)
    for name, lineno in _import_bindings(tree):
        if lineno in noqa:
            continue
        if name not in used:
            problems.append(f"{rel}:{lineno}: unused import '{name}'")

    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            if node.lineno not in noqa:
                problems.append(f"{rel}:{node.lineno}: bare 'except:'")
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            defaults = list(node.args.defaults) + [
                d for d in node.args.kw_defaults if d is not None]
            for d in defaults:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    if d.lineno not in noqa:
                        problems.append(
                            f"{rel}:{d.lineno}: mutable default argument")
    return problems


def main() -> int:
    files: list[pathlib.Path] = []
    for t in TARGETS:
        p = REPO / t
        if p.is_dir():
            files += sorted(p.rglob("*.py"))
        elif p.exists():
            files.append(p)
    problems = []
    for f in files:
        if "__pycache__" in f.parts:
            continue
        problems += lint_file(f)
    for p in problems:
        print(p)
    print(f"lint: {len(files)} files, {len(problems)} problems",
          file=sys.stderr)
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
