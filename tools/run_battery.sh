#!/usr/bin/env bash
# Property battery: the fold/splice/refresh equivalence properties guard
# the hardest invariants in the engine (splice == in-order fold, MV
# incremental == full recompute, CDC fold == pure-Python fold, ...).
# The default per-run budget (5 examples) is deliberately small so the
# regular suite stays fast — this script re-runs JUST those properties
# with a 100-example budget and a fixed derandomized seed.  Run it once
# per round; record the result in NOTES_r{N}.md.  Found counterexamples
# land in .hypothesis/examples (checked in) and replay first on every
# later run, so a falsified property stays falsified across sessions.
set -euo pipefail
cd "$(dirname "$0")/.."
SPARK_GRAFT_EXAMPLES="${SPARK_GRAFT_EXAMPLES:-100}" \
exec python -m pytest tests/test_properties.py \
    -k "fold or refresh or splice or backfill or row_tracking or manifest or vacuum_lite or txn_staging or cdf_values" \
    -q "$@"
