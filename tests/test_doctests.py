"""Doctest gate over the pure (no-Spark-session) function surface —
the reference's dev discipline runs doctests in CI (setup.cfg:76-84);
ours covers the dial numerics and rebuild rules whose docstring
examples double as the canonical worked calibrations (q112's (13,2)
literally appears as the choose_band_dial example)."""

from __future__ import annotations

import doctest

import aerovaldb_spark.operators.events as events
import aerovaldb_spark.operators.similarity as similarity
import aerovaldb_spark.operators.text as text


def test_pure_function_doctests():
    for mod in (text, similarity):
        result = doctest.testmod(mod, verbose=False)
        assert result.failed == 0, f"{mod.__name__}: {result}"
        assert result.attempted >= 4, (
            f"{mod.__name__}: expected its dial/verdict doctests to be "
            f"collected, found only {result.attempted}"
        )
    r = doctest.testmod(events, verbose=False)
    assert r.failed == 0 and r.attempted >= 2, r


def test_unused_import_gate_is_clean():
    """The stdlib static gate (tools/lint_imports.py — the executable
    part of the typing gate in this container) stays clean: every
    import in the package, tests, tools, and examples is used or
    carries an explicit noqa."""
    import subprocess
    import sys
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "lint_imports.py")],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_lint_imports_noqa_is_per_alias(tmp_path):
    """On a multi-line ``from x import (...)``, a noqa beside ONE name
    exempts exactly that name — not its siblings (second-pass review
    finding: the statement-level lineno made per-alias noqa dead and
    a from-line noqa a blanket exemption)."""
    import subprocess
    import sys
    import os

    f = tmp_path / "mod.py"
    f.write_text(
        "from os.path import (\n"
        "    join,\n"
        "    split,  # noqa: intentionally re-exported\n"
        ")\n"
    )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "lint_imports.py"),
         str(f)],
        capture_output=True, text=True,
    )
    assert proc.returncode == 1
    assert "'join'" in proc.stdout  # the un-noqa'd sibling still flags
    assert "'split'" not in proc.stdout
