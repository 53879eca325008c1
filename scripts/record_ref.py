#!/usr/bin/env python3
"""Floor-aware BENCH_REF recorder (round-16 verdict item).

Promotes a full-suite BENCH.json (an idle-host recording) to BENCH_REF.json,
with the one transformation the raw copy lacked: a reference row is REFUSED
below that query's measured isolated-JIT floor. The r15 incident: the
idle-evening re-record shipped text_perplexity_buckets at 0.237 s — an
in-suite-warm reading below the query's own 20-iteration isolated asymptote
(median 0.606, min 0.519, docs/asymptote_r15.json) — so every subsequent
driver run read >2x against a row that cannot be reproduced in isolation,
a false flag by construction.

Rule: row := max(in-suite median, asymptote median) for every query that has
a row in ANY docs/asymptote_*.json artifact (later rounds win on duplicate
keys). Floored rows are reported in-band in a `floored` field (original
in-suite value kept alongside) — nothing silent.

Usage:
    python3 scripts/record_ref.py            # BENCH.json -> BENCH_REF.json
    python3 scripts/record_ref.py --dry-run  # print what would change
"""
import glob
import json
import re
import sys

dry = "--dry-run" in sys.argv

bench = json.load(open("BENCH.json"))

if bench.get("errors"):
    sys.exit(f"REFUSE: BENCH.json has errors: {bench['errors']}")

# Merge asymptote artifacts, later rounds winning (sort by round number).
def round_no(path):
    m = re.search(r"asymptote_r(\d+)\.json$", path)
    return int(m.group(1)) if m else -1

floors = {}
for path in sorted(glob.glob("docs/asymptote_r*.json"), key=round_no):
    art = json.load(open(path))
    for q, med in art.get("queries", {}).items():
        if med is not None and med > 0:
            floors[q] = {"floor": med, "src": path}

floored = {}
queries = dict(bench["queries"])
for q, v in queries.items():
    f = floors.get(q)
    if v is not None and f and v < f["floor"]:
        floored[q] = {"in_suite": v, "floor": f["floor"], "src": f["src"]}
        queries[q] = f["floor"]

out = dict(bench)
out["queries"] = queries
out["value"] = sum(v for v in queries.values() if v is not None)
out["floored"] = floored
out["recorder"] = "scripts/record_ref.py (floor-aware)"

n = len([v for v in queries.values() if v is not None])
print(f"record_ref: {n} query rows, total {out['value']:.1f}s "
      f"(raw {bench['value']:.1f}s), {len(floored)} floored")
for q, info in sorted(floored.items()):
    print(f"  floored {q}: {info['in_suite']:.3f} -> {info['floor']:.3f} "
          f"({info['src']})")
if not dry:
    with open("BENCH_REF.json", "w") as fh:
        json.dump(out, fh)
    print("record_ref: wrote BENCH_REF.json")
