"""AST lint for the repo (the real-linter leg of `make lint`; analog of
the reference's cppcheck wiring, Makefile:237-243 — this environment
ships no pyflakes/ruff/cppcheck, so the checks are implemented here).

Checks (each a real bug class this codebase cares about):
  unused-import       import never referenced in the module
  bare-except         `except:` catching SystemExit/KeyboardInterrupt
  mutable-default     list/dict/set literal as a default argument
  duplicate-def       same function/class name bound twice at a scope
  f-string-no-field   f-string with no {} placeholder (forgot the f?)
  eq-none             `== None` / `!= None` instead of `is`

Allowlist: `# lint: ok` on the offending line suppresses it.
Exit 1 on any finding. Native C++ is linted separately by
`g++ -fsyntax-only -Wall -Wextra` (see Makefile).
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path


def _names_loaded(tree: ast.AST) -> set[str]:
    out = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            out.add(node.id)
        elif isinstance(node, ast.Attribute):
            # record the ROOT name of dotted access (np.foo -> np)
            cur = node
            while isinstance(cur, ast.Attribute):
                cur = cur.value
            if isinstance(cur, ast.Name):
                out.add(cur.id)
    return out


def lint_file(path: Path) -> list[str]:
    src = path.read_text()
    lines = src.splitlines()

    def ok(lineno: int) -> bool:
        if not (0 < lineno <= len(lines)):
            return False
        line = lines[lineno - 1]
        return "# lint: ok" in line or "# noqa" in line

    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax-error {e.msg}"]
    problems = []
    loaded = _names_loaded(tree)
    # module docstring/__all__ re-export conventions: a name exported via
    # __all__ or an explicit re-export file (__init__.py) counts as used
    exported = set()
    for node in ast.walk(tree):
        if (isinstance(node, ast.Assign)
                and any(isinstance(t, ast.Name) and t.id == "__all__"
                        for t in node.targets)
                and isinstance(node.value, (ast.List, ast.Tuple))):
            for elt in node.value.elts:
                if isinstance(elt, ast.Constant) and isinstance(elt.value, str):
                    exported.add(elt.value)
    is_init = path.name == "__init__.py"

    # format-spec JoinedStrs (the ":.1f" part of a field) are children
    # of FormattedValue and must not be treated as f-strings themselves
    spec_ids = {id(node.format_spec) for node in ast.walk(tree)
                if isinstance(node, ast.FormattedValue)
                and node.format_spec is not None}

    for node in ast.walk(tree):
        if isinstance(node, (ast.Import, ast.ImportFrom)) and not is_init:
            if getattr(node, "module", None) == "__future__":
                continue
            for alias in node.names:
                name = (alias.asname or alias.name).split(".")[0]
                if alias.name == "*":
                    continue
                if name not in loaded and name not in exported \
                        and not ok(node.lineno):
                    problems.append(
                        f"{path}:{node.lineno}: unused-import {name}")
        elif isinstance(node, ast.ExceptHandler):
            if node.type is None and not ok(node.lineno):
                problems.append(f"{path}:{node.lineno}: bare-except")
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in node.args.defaults + node.args.kw_defaults:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)) \
                        and not ok(d.lineno):
                    problems.append(
                        f"{path}:{d.lineno}: mutable-default in "
                        f"{node.name}()")
        elif isinstance(node, ast.JoinedStr):
            if id(node) not in spec_ids \
                    and not any(isinstance(v, ast.FormattedValue)
                                for v in node.values) \
                    and not ok(node.lineno):
                problems.append(
                    f"{path}:{node.lineno}: f-string-no-field")
        elif isinstance(node, ast.Compare):
            for op, cmp_ in zip(node.ops, node.comparators):
                if isinstance(op, (ast.Eq, ast.NotEq)) \
                        and isinstance(cmp_, ast.Constant) \
                        and cmp_.value is None and not ok(node.lineno):
                    problems.append(
                        f"{path}:{node.lineno}: eq-none (use `is`)")
    # duplicate defs per scope body
    for scope in ast.walk(tree):
        body = getattr(scope, "body", None)
        if not isinstance(body, list):
            continue
        seen: dict[str, int] = {}
        for stmt in body:
            if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                if stmt.name in seen and not ok(stmt.lineno):
                    problems.append(
                        f"{path}:{stmt.lineno}: duplicate-def "
                        f"{stmt.name} (first at :{seen[stmt.name]})")
                seen[stmt.name] = stmt.lineno
    return problems


def main(argv: list[str]) -> int:
    roots = [Path(a) for a in argv] or [Path("fftlab")]
    files: list[Path] = []
    for r in roots:
        if r.is_file():
            files.append(r)
        else:
            files.extend(sorted(r.rglob("*.py")))
    problems = []
    for f in files:
        if "__pycache__" in f.parts:
            continue
        problems.extend(lint_file(f))
    for p in problems:
        print(p)
    print(f"lint: {len(files)} files, {len(problems)} findings")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
