#!/usr/bin/env bash
# Seed-perturbed correctness gate (r15 verdict item 6): regenerate the
# sf0.01 fixture under a DIFFERENT seed (scripts/gen_fixture.py — same
# schemas/keys/value-sets, every value re-drawn) and run the full oracle
# compare against it. Certifies the oracles are seed-generic: a query that
# passes only because a seed-42 planted value coincides on both engines —
# the vacuity class the 0-row guard cannot see — diverges here.
#
#   scripts/gate_seeded.sh [seed]      # default 1337
#
# Dev tooling (driver-side python); the engine itself is pure Scala.
set -uo pipefail
cd "$(dirname "$0")/.."

seed="${1:-1337}"
fix="/dev/shm/graft_seedfix/sf0.01"
out="/tmp/graft_gate_seed$seed"

python3 scripts/gen_fixture.py /root/testdata/sf0.01 "$fix" "$seed" || exit 1

rm -rf "$out"
echo "== seeded gate: sf0.01 @ seed $seed =="
sbt -batch "runMain graft.Verify $fix $out" 2>&1 \
  | grep -E '\[verify\].*failed|^\[error\].*Exception' || true
python3 scripts/check.py "$fix" "$out"
status=$?
if [ $status -eq 0 ]; then
  echo "SEEDED GATE: green at seed $seed (oracles are seed-generic)"
fi
exit $status
