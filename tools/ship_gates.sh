#!/usr/bin/env bash
# One-shot pre-ship gate runner (the checklist in queries.py's
# docstring, executable): full pytest, driver-style sweeps with dtype
# parity at sf0.01 and plain at sf0.1, then bench. Exits non-zero on
# the first red gate. Artifacts land in /tmp/ship_gates.*
set -u
cd "$(dirname "$0")/.."

echo "== gate 0/4: ledger/window consistency =="
python tools/ledger.py --check || { echo "LEDGER RED"; exit 1; }

echo "== gate 1/4: full pytest (INCLUDING the slow tier) =="
# pytest.ini deselects `slow` by default so the driver's bounded run
# completes (r13 verdict item #2); the ship gate runs everything.
out=$(python -m pytest tests/ -q -m "" 2>&1 | tail -2)
echo "$out"
echo "$out" | grep -qiE "failed|error" && { echo "PYTEST RED"; exit 1; }
echo "$out" | grep -qE "[0-9]+ passed" || { echo "PYTEST RED"; exit 1; }

echo "== gate 2/4: sf0.01 sweep --dtypes =="
python tools/sweep_oracle.py --dtypes /root/testdata/sf0.01 \
    > /tmp/ship_gates.sf001.jsonl 2>/dev/null \
    || { tail -1 /tmp/ship_gates.sf001.jsonl; echo "SWEEP sf0.01 RED"; exit 1; }
tail -1 /tmp/ship_gates.sf001.jsonl

echo "== gate 3/4: sf0.1 sweep =="
python tools/sweep_oracle.py /root/testdata/sf0.1 \
    > /tmp/ship_gates.sf01.jsonl 2>/dev/null \
    || { tail -1 /tmp/ship_gates.sf01.jsonl; echo "SWEEP sf0.1 RED"; exit 1; }
tail -1 /tmp/ship_gates.sf01.jsonl

echo "== gate 4/4: bench summary line =="
python bench.py 2>/dev/null | tail -1 > /tmp/ship_gates.bench
cat /tmp/ship_gates.bench
python - <<'EOF' || exit 1
import json
line = open("/tmp/ship_gates.bench").read().strip()
d = json.loads(line)
assert len(line) <= 1500, f"summary line {len(line)} chars"
assert d["metric"] == "headline_queries_total" and d["n_queries"] > 0
print(f"bench OK: {d['value']}s / {d['n_queries']} queries, "
      f"line {len(line)} chars")
EOF
echo "== ALL GATES GREEN =="
