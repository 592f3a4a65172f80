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
    echo "typecheck: mypy not installed in this environment; skipping (config: pyproject.toml [tool.mypy])"
    exit 0
fi
