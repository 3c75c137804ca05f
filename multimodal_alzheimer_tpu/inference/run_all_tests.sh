#!/usr/bin/env bash
# Run every evaluation entry point (reference inference/run_all_tests.sh:13-21:
# executes every executable test_* file in the directory).
set -u
DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
PKG_ROOT="$(dirname "$(dirname "$DIR")")"
cd "$PKG_ROOT"
for f in "$DIR"/test_*.py; do
  name="$(basename "$f" .py)"
  echo "=== $name ==="
  python -m "multimodal_alzheimer_tpu.inference.$name" || echo "FAILED: $name"
done
