#!/bin/bash
# Full-suite CI entry: everything gate.sh checks PLUS the slow lane (the 53
# heavy parity tests the default marker set deselects: full-model CPU
# compiles, torch-oracle checkpoint round-trips, subprocess e2e workflows).
#
#   bash scripts/ci.sh          # ~40+ min on a 1-core box
#
# gate.sh stays the fast pre-commit check; this is the pre-release /
# nightly check that keeps the slow lane from silently rotting (round-4
# verdict weak #6).  Prints CI_PASS and exits 0 only if everything is
# green.
set -e
cd "$(dirname "$0")/.."

bash scripts/gate.sh

echo "=== ci: full suite (slow lane included)"
python -m pytest tests/ -q -m "slow or not slow"

echo "CI_PASS"
