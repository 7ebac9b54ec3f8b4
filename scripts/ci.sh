#!/usr/bin/env bash
# Full local gate: test suite at sf0.001, oracle sweep at the driver's
# sf0.01, and the bench contract. Mirrors what the round driver checks.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest (sf0.001 fixtures + unit/property/plan/streaming) =="
python -m pytest tests/ -q

echo "== oracle sweep at sf0.01 (the driver's correctness SF) =="
HARMONY_TEST_SF_DIR=/root/testdata/sf0.01 python -m pytest tests/test_oracle_queries.py -q

echo "== bench contract (one JSON line) =="
python bench.py 2>/dev/null | python -c "
import json, sys
d = json.load(sys.stdin)
assert {'metric','value','unit','queries','sf'} <= set(d), d.keys()
print(f'bench OK: {d[\"value\"]}s over {len(d[\"queries\"])} queries at sf={d[\"sf\"]}')"
