#!/bin/bash -e
# Lint the codebase before commit (role of reference dev/linter.sh).
# This environment ships no black/isort pins; run what is available and
# always run the critical-error flake8 tier + a bytecode compile check.

cd "$(dirname "$0")/.."

if command -v isort > /dev/null; then
  echo "Running isort ..."
  isort --atomic fsgd_tpu tools demo dev tests || true
fi

if command -v black > /dev/null; then
  echo "Running black ..."
  black -l 100 fsgd_tpu tools demo dev tests || true
fi

if python -c "import flake8" 2>/dev/null; then
  echo "Running flake8 (critical errors) ..."
  python -m flake8 fsgd_tpu tools demo dev tests \
    --select=E9,F63,F7,F82 --show-source --statistics
elif python -c "import pyflakes" 2>/dev/null; then
  echo "Running pyflakes ..."
  python -m pyflakes fsgd_tpu tools demo dev tests
else
  echo "flake8/pyflakes not installed; skipping static lint"
fi

echo "Running compileall ..."
python -m compileall -q fsgd_tpu tools demo dev

echo "linter.sh OK"
