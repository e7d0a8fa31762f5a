"""Stdlib-only style gate: the fallback behind scripts/format.sh.

Checks the few mechanical rules this codebase holds itself to (no formatter
is baked into the image): 99-col lines (the target is 79; the gate allows
the measured tail of the existing code so it stays a usable pre-commit
check), no tabs, no trailing whitespace, files end with exactly one
newline, and every module compiles.
"""

from __future__ import annotations

import pathlib
import py_compile
import sys

LIMIT = 99


def check(path: pathlib.Path) -> list[str]:
    problems = []
    text = path.read_text()
    for i, line in enumerate(text.splitlines(), 1):
        if len(line) > LIMIT and "http" not in line:
            problems.append(f"{path}:{i}: line too long ({len(line)})")
        if line != line.rstrip():
            problems.append(f"{path}:{i}: trailing whitespace")
        if "\t" in line:
            problems.append(f"{path}:{i}: tab character")
    if text and not text.endswith("\n"):
        problems.append(f"{path}: no trailing newline")
    try:
        py_compile.compile(str(path), doraise=True)
    except py_compile.PyCompileError as e:
        problems.append(f"{path}: {e.msg}")
    return problems


def main() -> int:
    roots = [pathlib.Path(a) for a in sys.argv[1:]] or [pathlib.Path(".")]
    problems = []
    for root in roots:
        files = [root] if root.is_file() else sorted(root.rglob("*.py"))
        for f in files:
            problems += check(f)
    for p in problems:
        print(p)
    print(f"{len(problems)} problem(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
