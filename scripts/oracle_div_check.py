#!/usr/bin/env python3
"""Pin the oracle engine's integer-division semantics AND run the actual
win_cusum oracle SQL on a negative-sum fixture.

Why this exists (ADVICE r16): round 16 shipped a pmod 'floor mean' in
winCusum on the belief that DuckDB `//` floors. It doesn't — DuckDB 1.0.0
TRUNCATES toward zero (-400//3 = -133), same as Spark `div`. The Scala spec
('win_cusum: negative-sum series uses the TRUNCATED mean') pins mu=-133 from
a hand computation; this script closes the loop by asserting the SAME values
out of the SAME oracle SQL the Verify gate runs, on the same negative series
— so if either engine's division semantics ever shift, one of the two pins
breaks and the divergence is visible instead of latent.

Run: python3 scripts/oracle_div_check.py   (exit 0 = parity pinned)
"""
import re
import subprocess
import sys

import duckdb

# 1. Raw division semantics of the oracle engine.
got = duckdb.sql("SELECT -400//3, -7//2, 400//3, 7//2").fetchone()
assert got == (-133, -3, 133, 3), f"DuckDB // semantics changed: {got}"

# 2. Extract winCusumSql verbatim from Oracles.scala (no copy to drift).
src = open("src/main/scala/graft/Oracles.scala").read()
m = re.search(
    r"winCusumSql: String =\s*\n(.*?)\"\"\"\.stripMargin", src, re.S)
assert m, "winCusumSql not found in Oracles.scala"
body = m.group(1)
sql = "\n".join(
    ln.split("|", 1)[1] if "|" in ln else ln
    for ln in body.replace('"""', "").splitlines() if ln.strip())

# 3. The negative-sum series from OperatorSpec ('-1,-1,-2 dollars').
con = duckdb.connect()
con.execute("""
  CREATE TABLE events AS
  SELECT * FROM (VALUES
    (1, TIMESTAMP '2024-01-01 00:01:00', 1, 't', -1.0, '{}'),
    (2, TIMESTAMP '2024-01-02 00:02:00', 1, 't', -1.0, '{}'),
    (3, TIMESTAMP '2024-01-03 00:03:00', 1, 't', -2.0, '{}'))
  t(event_id, ts, user_id, event_type, value, props)
""")
row = con.execute(sql).fetchone()
# (event_type, n_events, mu_cents, max_cusum_up, peak_up_idx,
#  max_cusum_down, peak_down_idx)
expect = ("t", 3, -133, 66, 2, 67, 3)
assert row == expect, f"oracle disagrees with the Scala spec: {row} != {expect}"

# 4. And the Spark side must pin the identical constants in its spec.
spec = open("src/test/scala/graft/OperatorSpec.scala").read()
for const in ['== -133L', '("max_cusum_up") == 66L', '("peak_up_idx") == 2L',
              '("max_cusum_down") == 67L', '("peak_down_idx") == 3L']:
    assert const in spec, f"OperatorSpec no longer pins {const!r}"

print("oracle_div_check: PASS — DuckDB // truncates; win_cusum oracle on the "
      f"negative series yields {row}, matching the Scala spec's pins.")
