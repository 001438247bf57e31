"""Dependency-free lint gate (reference parity: scripts/ci/lint.sh).

The sandbox ships no ruff/flake8/pyflakes and installs are forbidden, so
`make lint` prefers ruff when present (dev machines — config in
pyproject.toml) and otherwise runs this AST-based checker:

- E9xx: every file must parse (ast.parse — syntax gate);
- F401: unused imports (module scope; `__init__.py` re-exports, `noqa`
  comments and underscore names are exempt);
- W291/293: trailing whitespace;
- E501: lines over 110 columns (warn-only — long SQL oracles are allowed).

Exit 1 on any F/E9/W finding. Usage: python scripts/ci/lint.py [paths...]
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

MAX_LINE = 110
DEFAULT_PATHS = ["entity_resolution_engine_ray", "tests", "scripts", "bench.py", "__ray_entry__.py"]


def _used_names(tree: ast.AST) -> set[str]:
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            root = node
            while isinstance(root, ast.Attribute):
                root = root.value
            if isinstance(root, ast.Name):
                used.add(root.id)
    return used


def lint_file(path: Path) -> tuple[list[str], int]:
    src = path.read_text()
    errors: list[str] = []
    warns = 0
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as exc:
        return [f"{path}:{exc.lineno}: E999 {exc.msg}"], 0

    lines = src.splitlines()
    for i, line in enumerate(lines, 1):
        if line != line.rstrip():
            errors.append(f"{path}:{i}: W291 trailing whitespace")
        if len(line) > MAX_LINE:
            warns += 1

    if path.name != "__init__.py":  # __init__ imports are the public API
        used = _used_names(tree)
        exported = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name) and t.id == "__all__":
                        for el in getattr(node.value, "elts", []):
                            if isinstance(el, ast.Constant):
                                exported.add(el.value)
        for node in tree.body:  # module scope only — local imports are lazy by design
            if isinstance(node, (ast.Import, ast.ImportFrom)):
                noqa = "noqa" in (lines[node.lineno - 1] if node.lineno <= len(lines) else "")
                if noqa:
                    continue
                if isinstance(node, ast.ImportFrom) and node.module == "__future__":
                    continue
                for alias in node.names:
                    name = (alias.asname or alias.name).split(".")[0]
                    if alias.name == "*" or name.startswith("_"):
                        continue
                    if name not in used and name not in exported:
                        errors.append(f"{path}:{node.lineno}: F401 '{alias.name}' imported but unused")
    return errors, warns


def main() -> int:
    roots = sys.argv[1:] or DEFAULT_PATHS
    files: list[Path] = []
    for r in roots:
        p = Path(r)
        files.extend(sorted(p.rglob("*.py")) if p.is_dir() else [p])
    all_errors: list[str] = []
    n_warn = 0
    for f in files:
        errs, warns = lint_file(f)
        all_errors.extend(errs)
        n_warn += warns
    for e in all_errors:
        print(e)
    print(f"lint: {len(files)} files, {len(all_errors)} errors, {n_warn} long-line warnings")
    return 1 if all_errors else 0


if __name__ == "__main__":
    sys.exit(main())
