#!/usr/bin/env bash
# Standing correctness gate: the full registry vs the DuckDB oracle at BOTH
# scale points (sf0.01 — the driver's gate scale — and sf0.1 — the bench
# scale, where scale-dependent logic like percentile boundaries, LSH
# auto-banding occupancy and sampling determinism could diverge), then a
# diff against the last RECORDED gate result so a regression is a loud
# exit-1 with names, not a silent count change.
#
#   scripts/gate.sh            # run both scales, diff vs docs/GATE.json
#   scripts/gate.sh --record   # run both scales, rewrite docs/GATE.json
#
# Dev tooling (driver-side python libs); the engine itself is pure Scala.
set -uo pipefail
cd "$(dirname "$0")/.."

record=0
[ "${1:-}" = "--record" ] && record=1

status=0
# standing semantics pin (r17): the oracle engine's integer-division
# truncation and the win_cusum oracle on a negative-sum series must agree
# with the Scala spec's constants — catches a silent engine/oracle
# divergence in either direction before the full compare runs
python3 scripts/oracle_div_check.py || status=1

for sf in 0.01 0.1; do
  out="/tmp/graft_gate_sf$sf"
  rm -rf "$out"
  echo "== gate: sf$sf =="
  if ! sbt -batch "runMain graft.Verify /root/testdata/sf$sf $out" \
      2>&1 | grep -E '\[verify\].*failed|^\[error\].*Exception'; then
    : # no verify failures printed — good
  fi
  python3 scripts/check.py "/root/testdata/sf$sf" "$out" || status=1
  cp "$out/check_results.json" "/tmp/gate_sf$sf.json"
done

python3 - "$record" <<'EOF' || status=1
import json, sys
record = sys.argv[1] == "1"
gate = {}
ok = True
for sf in ("0.01", "0.1"):
    cur = json.load(open(f"/tmp/gate_sf{sf}.json"))["results"]
    gate[sf] = sorted(k for k, v in cur.items() if v)
    fails = sorted(k for k, v in cur.items() if not v)
    if fails:
        ok = False
        print(f"GATE sf{sf}: {len(fails)} FAILING: {', '.join(fails[:20])}")
if record:
    json.dump(gate, open("docs/GATE.json", "w"), indent=1)
    print("GATE: recorded docs/GATE.json "
          + ", ".join(f"sf{sf}={len(v)}" for sf, v in gate.items()))
else:
    try:
        prev = json.load(open("docs/GATE.json"))
    except FileNotFoundError:
        print("GATE: no docs/GATE.json — run with --record first")
        sys.exit(0 if ok else 1)
    for sf in ("0.01", "0.1"):
        lost = sorted(set(prev.get(sf, [])) - set(gate[sf]))
        new = sorted(set(gate[sf]) - set(prev.get(sf, [])))
        if lost:
            ok = False
            print(f"GATE sf{sf}: REGRESSED vs recorded: {', '.join(lost)}")
        if new:
            print(f"GATE sf{sf}: newly passing (re-record): {', '.join(new)}")
        print(f"GATE sf{sf}: {len(gate[sf])} pass "
              f"(recorded {len(prev.get(sf, []))})")
sys.exit(0 if ok else 1)
EOF

exit $status
