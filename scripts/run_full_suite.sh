#!/usr/bin/env bash
# Full test suite in two process halves.
#
# A single-process `pytest tests/` run compiles many hundreds of XLA:CPU
# programs; after ~90% of the suite the XLA CPU compiler can segfault
# (observed in jax's backend_compile_and_load during round 5 — every test
# passes in a fresh process, so it is accumulated in-process compiler
# state, not a test bug). Two halves keep each process comfortably inside
# the stable range while preserving full coverage.
set -e
cd "$(dirname "$0")/.."
export JAX_PLATFORMS="${JAX_PLATFORMS:-cpu}"
FILES=$(ls tests/test_*.py | sort)
N=$(echo "$FILES" | wc -l)
HALF=$(( (N + 1) / 2 ))
FIRST=$(echo "$FILES" | head -n $HALF)
SECOND=$(echo "$FILES" | tail -n +$((HALF + 1)))
echo "== half 1 ($HALF files) =="
python -m pytest $FIRST -q "$@"
echo "== half 2 ($((N - HALF)) files) =="
python -m pytest $SECOND -q "$@"
