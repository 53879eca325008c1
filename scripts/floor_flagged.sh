#!/usr/bin/env bash
# Standing isolated-floor instrument (r15 verdict stretch item): every query
# the LAST bench run flagged against BENCH_REF — slow-vs-ref (>2x, the
# judge's per-query direction, now the in-band `ref_slow` field), stale-high
# (ref >2x today), or missing a ref row — gets a 20-iteration isolated floor
# run, appended to this round's docs/asymptote_r<N>.json. That artifact is
# what scripts/record_ref.py floors the next BENCH_REF against, so per-round
# ">2x but it's just JIT/in-suite state" litigation becomes a measurement.
#
#   scripts/floor_flagged.sh            # floor whatever BENCH.json flags
#   scripts/floor_flagged.sh q1,q2      # floor an explicit list
#
# Dev tooling (driver-side python for JSON plumbing; engine is pure Scala).
set -euo pipefail
cd "$(dirname "$0")/.."

round="${GRAFT_ROUND:-16}"
art="docs/asymptote_r${round}.json"

if [ $# -ge 1 ]; then
  queries="$1"
else
  queries=$(python3 - <<'EOF'
import json
b = json.load(open("BENCH.json"))
qs = sorted(set(b.get("ref_slow", [])) | set(b.get("ref_stale_high", []))
            | set(b.get("ref_missing", [])))
print(",".join(qs))
EOF
)
fi

if [ -z "$queries" ]; then
  echo "floor_flagged: nothing flagged; no floors to run"
  exit 0
fi
echo "floor_flagged: running 20-iteration isolated floors for: $queries"

# the floor run overwrites BENCH.json (Bench's fixed output path); preserve
# the caller's full-suite artifact so record_ref.py can still promote it.
# Restore via EXIT trap: under `set -e` a failed sbt/merge step would
# otherwise skip a trailing mv and leave BENCH.json overwritten with the
# floor run's partial output (ADVICE r16).
full_bench=$(mktemp)
cp BENCH.json "$full_bench" 2>/dev/null || full_bench=""
trap '[ -n "$full_bench" ] && [ -f "$full_bench" ] && mv "$full_bench" BENCH.json' EXIT

SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  SPARK_GRAFT_BENCH_ONLY="$queries" \
  SPARK_GRAFT_WARM_ITERS=20 SPARK_GRAFT_MAX_ITERS=20 \
  sbt -batch "runMain graft.Bench" >/dev/null

python3 - "$art" <<'EOF'
import json, os, sys
art = sys.argv[1]
run = json.load(open("BENCH.json"))
merged = json.load(open(art)) if os.path.exists(art) else {}
# keep the full bench fields of the LATEST floor run, but merge query maps
for field in ("queries", "query_min", "query_max", "query_q1", "query_q3",
              "query_iters", "query_cpu", "cold_queries"):
    prev = merged.get(field, {})
    prev.update(run.get(field, {}))
    run[field] = prev
json.dump(run, open(art, "w"))
print(f"floor_flagged: {art} now floors "
      + ", ".join(f"{q}={v:.3f}" for q, v in sorted(run["queries"].items())))
EOF

# BENCH.json restore happens in the EXIT trap (success and failure paths).

