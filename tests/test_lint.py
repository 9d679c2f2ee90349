"""The in-repo lint gate runs as part of the suite (hygiene tier).

The reference enforces style/static checks via pre-commit
(/root/reference/.pre-commit-config.yaml: checkpatch, codespell, black,
flake8, mypy); this repo's equivalent gate is tools/lint.py (stdlib-only,
so it runs everywhere the tests run) plus ruff/mypy advisory steps in CI.
"""

import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_lint_clean():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "lint.py")],
        capture_output=True, text=True)
    assert proc.returncode == 0, f"lint problems:\n{proc.stdout}"
