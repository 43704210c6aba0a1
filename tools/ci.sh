#!/usr/bin/env bash
# Local CI mirror of .github/workflows/{ruff,pytest}.yml — the same gates the
# reference runs (ruff check + pytest; reference .github/workflows/).
#
# Usage: tools/ci.sh [--lint-only|--test-only]
#
# ruff is a dev-only dependency; on hosts without it (e.g. the hermetic TPU
# image) the lint step degrades to a byte-compile sweep so the script still
# catches syntax errors, and says so.
set -euo pipefail
cd "$(dirname "$0")/.."

run_lint=1 run_tests=1
case "${1:-}" in
  --lint-only) run_tests=0 ;;
  --test-only) run_lint=0 ;;
esac

if [ "$run_lint" = 1 ]; then
  if command -v ruff >/dev/null 2>&1; then
    echo "== ruff check =="
    ruff check .
    echo "== ruff format --check =="
    ruff format --check .
  else
    echo "== ruff not installed: falling back to python -m compileall =="
    python -m compileall -q yolo_tpu tools tests \
      train.py evaluate.py predict.py serve.py bench.py __graft_entry__.py
  fi
fi

if [ "$run_tests" = 1 ]; then
  echo "== pytest (8-virtual-device CPU mesh) =="
  python -m pytest tests/
fi
echo "CI OK"
