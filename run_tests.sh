#!/usr/bin/env bash
# Full test suite, sharded into a few processes.
#
# Rationale: one ~300-test megaprocess accumulates hundreds of compiled
# XLA:CPU executables plus concurrent background-thread execution
# (pipelined pose graphs), and XLA:CPU intermittently aborts (Fatal
# Python error inside native code) under that cumulative load — no single
# module reproduces it. The reference's own test model runs every test as
# its own binary (SURVEY.md §4, CMake one-binary-per-test); sharding is
# the same isolation, coarser. The persistent compilation cache
# (tests/conftest.py) makes the extra interpreter startups cheap.
set -euo pipefail
cd "$(dirname "$0")"

PYTEST=(python -m pytest -q)

"${PYTEST[@]}" tests/test_[a-i]*.py
"${PYTEST[@]}" tests/test_[j-q]*.py
"${PYTEST[@]}" tests/test_[r-z]*.py
echo "ALL SHARDS GREEN"
