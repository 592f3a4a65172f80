#!/bin/sh
# Typing gate (reference dev-discipline parity: the reference CI runs
# mypy over src/aerovaldb, setup.cfg:85-90). Config lives in
# pyproject.toml [tool.mypy]. The benchmark container does not bake
# mypy in (and installs are forbidden there), so this script is a
# no-op with a notice when mypy is absent — CI environments that have
# mypy get the real gate.
if command -v mypy >/dev/null 2>&1; then
    exec mypy aerovaldb_spark
elif python -c "import mypy" >/dev/null 2>&1; then
    exec python -m mypy aerovaldb_spark
else
    # mypy is absent in the benchmark container (installs forbidden) —
    # run the stdlib-only static gate we CAN run anywhere instead of
    # exiting silently: the unused-import checker (tools/
    # lint_imports.py; it would have caught r11's dead-import advice
    # finding mechanically). CI environments with mypy still get the
    # full gate above.
    echo "typecheck: mypy not installed; running tools/lint_imports.py (config: pyproject.toml [tool.mypy])"
    exec python "$(dirname "$0")/lint_imports.py"
fi
