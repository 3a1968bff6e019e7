#!/usr/bin/env bash
# Full verification sweep: tests, DuckDB oracle gate, F1 pin, bench.
# Usage: bash tools/run_all_checks.sh
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== pytest ==="
python -m pytest tests/ -x -q

echo "=== DuckDB oracle gate (sf0.01) ==="
python tools/check_oracle.py

echo "=== F1 pin ==="
python tools/evaluate_f1.py 4000

echo "=== bench ==="
python bench.py
