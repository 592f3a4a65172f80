"""Unused-import gate (stdlib-only pyflakes subset).

The reference's CI runs a real static gate (mypy, setup.cfg:85-90);
this container bakes in no checker and installs are forbidden, so
tools/typecheck.sh degraded to a config-only notice — and unused
imports slipped through repeatedly (the r11 advice found a dead
``scoped_persist`` import a lint gate would have flagged). This is
the executable subset we can run ANYWHERE: per file, every name an
``import``/``from .. import`` statement binds must be referenced
somewhere else in the module (as a load, an attribute root, a
re-export in ``__all__``, or an explicit ``del``).

Escapes: a trailing ``# noqa`` on the import line, ``__init__.py``
re-export imports referenced by ``__all__``, and ``_``-prefixed
binds are NOT exempt (an intentionally-unused import should carry
noqa and a reason).

Usage: python tools/lint_imports.py [paths...]   (default: the
package + tests + tools). Exits 1 with a file:line listing when
anything is unused.
"""

from __future__ import annotations

import ast
import os
import sys


def _binds(node: ast.AST):
    """(bound_name, display, lineno) for each name an import binds.
    The lineno is the ALIAS node's own line, not the statement's —
    a ``# noqa`` beside one name of a multi-line ``from x import
    (...)`` must exempt exactly that name, and a noqa on the ``from``
    line must not silently exempt every sibling."""
    if isinstance(node, ast.Import):
        for a in node.names:
            # ``import a.b`` binds root ``a``; ``import a.b as c`` -> c
            name = a.asname or a.name.split(".")[0]
            yield name, a.name, getattr(a, "lineno", node.lineno)
    elif isinstance(node, ast.ImportFrom):
        for a in node.names:
            if a.name == "*":
                continue
            yield (
                a.asname or a.name,
                a.name,
                getattr(a, "lineno", node.lineno),
            )


def check_file(path: str) -> list[str]:
    src = open(path, encoding="utf-8").read()
    tree = ast.parse(src, filename=path)
    lines = src.splitlines()
    problems = []

    imports: list[tuple[str, str, int]] = []
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module == "__future__":
            continue  # compiler directives bind nothing usable
        for name, display, lineno in _binds(node):
            line = lines[lineno - 1] if lineno <= len(lines) else ""
            if "noqa" in line:
                continue
            imports.append((name, display, lineno))
    if not imports:
        return problems

    used: set[str] = set()

    def _use_names_in(expr: ast.AST) -> None:
        for sub in ast.walk(expr):
            if isinstance(sub, ast.Name):
                used.add(sub.id)

    def _annotation_usage(node: ast.AST) -> None:
        """QUOTED annotations ("AerovalSparkDB") parse as string
        constants, not Names — re-parse them so TYPE_CHECKING imports
        referenced only from annotations count as used."""
        anns = []
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            args = node.args
            anns = [
                a.annotation
                for a in (
                    args.posonlyargs + args.args + args.kwonlyargs
                    + ([args.vararg] if args.vararg else [])
                    + ([args.kwarg] if args.kwarg else [])
                )
                if a.annotation is not None
            ]
            if node.returns is not None:
                anns.append(node.returns)
        elif isinstance(node, ast.AnnAssign):
            anns = [node.annotation]
        for a in anns:
            if isinstance(a, ast.Constant) and isinstance(a.value, str):
                try:
                    _use_names_in(ast.parse(a.value, mode="eval"))
                except SyntaxError:
                    pass
            else:
                _use_names_in(a)

    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and not isinstance(
            node.ctx, ast.Store
        ):
            used.add(node.id)
        else:
            _annotation_usage(node)

    # __all__ re-exports count as usage (package __init__ pattern)
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    for elt in ast.walk(node.value):
                        if isinstance(elt, ast.Constant) and isinstance(
                            elt.value, str
                        ):
                            used.add(elt.value)

    for name, display, lineno in imports:
        if name not in used:
            problems.append(
                f"{path}:{lineno}: imported name {name!r} "
                f"(from {display!r}) is never used"
            )
    return problems


DEFAULT_TARGETS = ("aerovaldb_spark", "tests", "tools", "examples")


def main(argv: list[str]) -> int:
    roots = argv or [
        os.path.join(os.path.dirname(os.path.dirname(__file__)), t)
        for t in DEFAULT_TARGETS
    ]
    files = []
    for r in roots:
        if os.path.isfile(r):
            files.append(r)
            continue
        for dirpath, _dirs, names in os.walk(r):
            if "__pycache__" in dirpath:
                continue
            files.extend(
                os.path.join(dirpath, n)
                for n in names
                if n.endswith(".py")
            )
    problems = []
    for f in sorted(files):
        try:
            problems.extend(check_file(f))
        except SyntaxError as e:
            problems.append(f"{f}: syntax error: {e}")
    for p in problems:
        print(p)
    print(f"lint_imports: {len(problems)} problem(s) in {len(files)} files")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
