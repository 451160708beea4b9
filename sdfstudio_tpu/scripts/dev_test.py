"""sst-dev-test: run the local CI gate (reference scripts/github/run_actions.py).

The reference's ns-dev-test runs its lint/format/test GitHub actions
locally. This environment pins no linters, so the gate is:

1. **compile check** — byte-compile every package/test file (catches
   syntax errors and most import-time typos without executing);
2. **docstring-citation audit** — every non-test module under
   sdfstudio_tpu/ must carry a module docstring (the repo's parity
   convention: docstrings cite the reference file:line they implement);
3. **fast test tier** — ``pytest -m "not slow"`` (~10 min on a 1-CPU box);
4. optionally ``--full`` for the whole suite.

Exits non-zero on the first failing stage, like a CI pipeline.
"""
from __future__ import annotations

import argparse
import ast
import compileall
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]


def check_compile() -> bool:
    print("[1/3] byte-compile check")
    ok = True
    for pkg in ("sdfstudio_tpu", "tests"):
        ok &= compileall.compile_dir(
            str(REPO / pkg), quiet=2, force=True, workers=1)
    return bool(ok)


def check_docstrings() -> bool:
    print("[2/3] module docstring audit")
    missing = []
    for path in sorted((REPO / "sdfstudio_tpu").rglob("*.py")):
        if path.name == "__init__.py":
            continue
        tree = ast.parse(path.read_text(encoding="utf8"))
        if ast.get_docstring(tree) is None:
            missing.append(path.relative_to(REPO))
    for m in missing:
        print(f"  missing module docstring: {m}")
    return not missing


def run_tests(full: bool) -> bool:
    tier = [] if full else ["-m", "not slow"]
    label = "full suite" if full else "fast tier"
    print(f"[3/3] pytest ({label})")
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "-x", *tier],
        cwd=REPO,
    )
    return proc.returncode == 0


def entrypoint():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--full", action="store_true",
                    help="run the full test suite instead of the fast tier")
    ap.add_argument("--skip-tests", action="store_true",
                    help="static stages only")
    args = ap.parse_args()

    stages = [check_compile(), check_docstrings()]
    if not all(stages):
        print("dev-test FAILED (static checks)")
        raise SystemExit(1)
    if not args.skip_tests and not run_tests(args.full):
        print("dev-test FAILED (tests)")
        raise SystemExit(1)
    print("dev-test OK")


if __name__ == "__main__":
    entrypoint()
