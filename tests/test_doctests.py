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
